"""Force an 8-device virtual CPU platform for all tests.

Multi-chip sharding is validated on a virtual mesh (SURVEY.md §4): TPU hardware
is not needed (or touched) by the test suite.

Note: the session environment imports jax from sitecustomize with
``JAX_PLATFORMS=axon`` already captured into jax's config, so plain env-var
edits here are too late — we override through ``jax.config`` before any
backend initialisation instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()


_exit_status = [0]


def pytest_sessionfinish(session, exitstatus):
    _exit_status[0] = int(exitstatus)
    # Diagnostics for shutdown hangs: any non-daemon thread alive here keeps
    # the interpreter from exiting on its own.
    import threading, sys, traceback

    stragglers = [
        t for t in threading.enumerate()
        if t is not threading.main_thread() and not t.daemon
    ]
    if stragglers:
        print("\n[conftest] non-daemon threads alive at sessionfinish:", file=sys.stderr)
        frames = sys._current_frames()
        for t in stragglers:
            print(f"  - {t.name} (ident={t.ident})", file=sys.stderr)
            if t.ident in frames:
                traceback.print_stack(frames[t.ident], file=sys.stderr)


import pytest  # noqa: E402


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    """Exit without running interpreter finalizers.

    Round-1 verdict: the full suite printed its summary then hung 40+ minutes
    until SIGKILL. The hang is not a Python thread (the sessionfinish dump
    above finds none) — it is C-level teardown of the sitecustomize-registered
    axon TPU PJRT plugin, whose client destructor can block when the chip is
    held elsewhere. All pytest work (reports, cache, tmpdir bookkeeping) is
    done by the time the trylast unconfigure hook runs, so a hard exit loses
    nothing and makes the suite's green/red signal reachable by any harness.
    """
    import os, sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status[0])
