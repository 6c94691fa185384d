from .misc import archive_code, count_params, set_host_seeds  # noqa: F401
