from .config import Registry, instantiate, load_yaml_config  # noqa: F401
