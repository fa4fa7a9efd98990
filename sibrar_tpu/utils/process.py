"""Process-hygiene helpers for multi-worker launches.

Parity target: `/root/reference/utilities/on_parent_exit.py:28-47` (Linux
prctl PDEATHSIG so child workers die with their parent) and the process-group
termination logic of `/root/reference/run_agent.py:89-103`.
"""
from __future__ import annotations

import signal


def on_parent_exit(sig: int = signal.SIGTERM):
    """preexec_fn for subprocess.Popen: deliver `sig` when the parent dies
    (Linux PR_SET_PDEATHSIG)."""
    import ctypes

    PR_SET_PDEATHSIG = 1

    def set_parent_exit_signal():
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        if libc.prctl(PR_SET_PDEATHSIG, sig) != 0:
            raise OSError(ctypes.get_errno(), "prctl(PR_SET_PDEATHSIG) failed")

    return set_parent_exit_signal


def terminate_process_group(proc, sig: int = signal.SIGTERM) -> None:
    """Signal a child's whole process group (requires start_new_session=True)."""
    import os

    try:
        os.killpg(os.getpgid(proc.pid), sig)
    except ProcessLookupError:
        pass
