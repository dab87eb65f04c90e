"""RETIRED (r4 measurement-integrity finding — PERFORMANCE.md:139-151).

This script timed all solver arms in ONE process with device->host fetches
between arms; on this runtime a single fetch permanently degrades the
process to synchronous dispatch, so every row after the first measured the
degraded host path, not the solver (the fictitious r3 "Newton 500x cliff"
came from exactly this).  It now execs the clean fetch-isolated protocol.
"""

import os
import sys

if __name__ == "__main__":
  sys.stderr.write(
      "ab_blocked_newton.py is RETIRED: its single-process protocol is "
      "fetch-degraded and every number it produced was retracted "
      "(PERFORMANCE.md r4).  Running scripts/ab_newton_r4.py instead.\n"
  )
  target = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ab_newton_r4.py")
  os.execv(sys.executable, [sys.executable, target] + sys.argv[1:])
