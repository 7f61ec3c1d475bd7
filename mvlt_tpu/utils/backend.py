"""Backend liveness guard.

A dead device transport (e.g. this rig's axon TPU tunnel) hangs the first
jax backend touch — ``jax.devices()`` — FOREVER, at ~0% CPU, which is
indistinguishable from a long compile unless you know the signature
(CLAUDE.md tunnel-outage playbook).  Every entry point that expects a
device (cli, bench, tools) calls ``backend_or_die`` so a dead transport
fails in minutes with a diagnosis instead of stalling drivers and CI.
"""

from __future__ import annotations

import os
import sys
import threading


def backend_or_die(timeout_s: int = 180):
    """``jax.devices()`` with a watchdog: abort the process with a
    diagnostic if backend init doesn't complete within ``timeout_s``."""
    import jax

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(f"jax backend init did not complete within {timeout_s}s — "
                  f"the device transport (axon TPU tunnel on this rig) is "
                  f"unreachable; aborting (see docs/OPERATIONS.md "
                  f"troubleshooting)", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    devices = jax.devices()
    done.set()
    return devices
