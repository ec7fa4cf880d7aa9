#!/usr/bin/env python
"""Run watchdog — relaunch a dead OMIP run from its latest checkpoint.

Rebuild of the reference's `watchdog.sh` (polls the queue hourly and
relaunches dead jobs; SURVEY.md §5 "Failure detection"): here a single-host
loop that (1) checks the launcher process is alive, (2) restarts it with
PICKUP=1 when it died, (3) stops after `MAX_RESTARTS`.
"""

import os
import subprocess
import sys
import time

LAUNCH = os.path.join(os.path.dirname(__file__), "launch.py")
POLL_S = float(os.environ.get("WATCHDOG_POLL_SECONDS", "3600"))
MAX_RESTARTS = int(os.environ.get("MAX_RESTARTS", "10"))


def main():
    restarts = 0
    env = dict(os.environ, PICKUP="1")
    proc = subprocess.Popen([sys.executable, LAUNCH], env=env)
    while True:
        time.sleep(POLL_S)
        code = proc.poll()
        if code is None:
            continue
        if code == 0:
            print("[watchdog] run completed cleanly")
            return 0
        restarts += 1
        if restarts > MAX_RESTARTS:
            print(f"[watchdog] giving up after {restarts} restarts")
            return 1
        print(f"[watchdog] run died (exit {code}); restart {restarts} "
              f"with pickup", flush=True)
        proc = subprocess.Popen([sys.executable, LAUNCH], env=env)


if __name__ == "__main__":
    raise SystemExit(main())
