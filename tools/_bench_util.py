"""Shared measurement helpers for the tools/ experiment scripts.

``jvm_cpu`` was previously copy-pasted verbatim into three A/B scripts
(ADVICE r15); it lives here so the measurement code is single-sourced.
"""

from __future__ import annotations

import os


def jvm_cpu() -> float:
    """Cumulative CPU seconds (user+sys) of this process's child JVM.

    Reads /proc/<pid>/stat of the java child whose ppid is this Python
    process — contention-robust metric for interleaved A/Bs on a host
    with ambient load (wall time swings with co-tenant weather; the
    JVM's own CPU seconds do not).
    """
    me = os.getpid()
    tck = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                s = fh.read()
            comm = s[s.index("(") + 1 : s.rindex(")")]
            rest = s[s.rindex(")") + 2 :].split()
            if "java" not in comm or int(rest[1]) != me:
                continue
            return (int(rest[11]) + int(rest[12])) / tck
        except (OSError, ValueError, IndexError):
            continue
    return 0.0
