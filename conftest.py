"""Root conftest: make the OBVIOUS invocation — plain `python -m pytest`
under this box's default environment — work (VERDICT r3 weak #4).

The default env boots every python process through an axon sitecustomize
that (a) registers a tunneled-TPU session holding the box's single TPU
grant for the process lifetime — silently blocking any concurrent real
TPU job — and (b) ends in a faulthandler crash dump at interpreter exit
even though tests/conftest.py forces the CPU backend.  The registration
happens at interpreter boot, so the only clean fix is to re-exec the
exact pytest invocation with the axon gate stripped.

Mechanics: pytest's fd-level capture is active from the moment conftests
load (the capture plugin wraps pytest_load_initial_conftests), so a
module-level execve would hand the replacement process fd 1/2 pointing
into a capture temp file and its entire output would be swallowed.
Instead the re-exec runs from pytest_sessionstart AFTER suspending the
capture manager, which dup2's the real terminal fds back first.  Set
JIG_KEEP_AXON=1 to opt out.
"""

import os
import sys


def _invoked_as_pytest_cli() -> bool:
    """Re-exec'ing as `python -m pytest *sys.argv[1:]` is only faithful
    when pytest WAS the command line.  Programmatic pytest.main() callers
    (argv[0] is some wrapper script) and pytest-xdist workers must run
    in-process instead (with the legacy exit-crash, but correct args)."""
    if os.environ.get("PYTEST_XDIST_WORKER"):
        return False
    argv0 = os.path.basename(sys.argv[0] or "")
    return argv0 in ("pytest", "py.test") or (
        argv0 == "__main__.py" and f"{os.sep}pytest{os.sep}" in (sys.argv[0] or ""))


def pytest_sessionstart(session):
    if not os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get("JIG_KEEP_AXON"):
        return
    if not _invoked_as_pytest_cli():
        return
    capman = session.config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
    except OSError:
        if capman is not None:
            capman.resume_global_capture()
        # fall through: the suite still runs, with the old exit-crash
