"""Bounded-RSS trainer runner for axon-tunnel hosts (VERDICT r4 weak #6).

The experimental axon tunnel client leaks host RSS ~1:1 with every
host→device transfer (DESIGN.md r4 item 12 — an environment artifact,
absent on real co-located TPU hosts), so a long training run that ships
a fresh batch per step grows host memory by its cumulative transfer
volume and eventually OOMs the host. Deterministic per-epoch
checkpoint/resume already makes restarts lossless (DATA.md caveat);
this wrapper automates them: run the stage CLI as a child process,
watch its RSS, and when it crosses the limit terminate it and relaunch
from the newest checkpoint via the stage's ``--*_resume`` flag —
repeating until the stage completes. At most the in-progress epoch is
redone per restart.

    python tools/run_bounded_rss.py --stage xe --rss_limit_mb 16000 \
        -- python train_xe.py --xe_epochs 40 ...

Stages: cpt / senti / xe / rl (their resume flag + checkpoint glob are
built in; override with --resume_flag/--ckpt_glob for custom layouts).
The child command runs from the current directory, like the bare CLI.
On a non-OOM child failure the wrapper exits with the child's code —
it never retries real errors.
"""
from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time

STAGES = {
    "cpt": ("--concept_resume", "checkpoint/concept/*/model_*.ckpt"),
    "senti": ("--senti_resume", "checkpoint/sentiment/model_*.ckpt"),
    "xe": ("--xe_resume", "checkpoint/xe/*/*/model_*.ckpt"),
    "rl": ("--rl_resume", "checkpoint/rl/*/*/model_*.ckpt"),
}


def rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def newest(pattern: str):
    cks = glob.glob(pattern)
    return max(cks, key=os.path.getmtime) if cks else None


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--stage", choices=sorted(STAGES))
    ap.add_argument("--rss_limit_mb", type=float, default=16000)
    ap.add_argument("--resume_flag", default="")
    ap.add_argument("--ckpt_glob", default="")
    ap.add_argument("--poll_s", type=float, default=5.0)
    ap.add_argument("--max_restarts", type=int, default=100)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- python train_xe.py ...")
    a = ap.parse_args(argv)
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    if not cmd:
        ap.error("no child command given (after --)")
    resume_flag = a.resume_flag or (STAGES[a.stage][0] if a.stage else "")
    ckpt_glob = a.ckpt_glob or (STAGES[a.stage][1] if a.stage else "")
    if not resume_flag or not ckpt_glob:
        ap.error("need --stage or both --resume_flag/--ckpt_glob")

    restarts = 0
    while True:
        run = list(cmd)
        ck = newest(ckpt_glob)
        if restarts and ck:
            # later occurrence wins in argparse, so appending overrides
            # any --*_resume the user passed
            run += [resume_flag, ck]
            print(f"[bounded-rss] restart {restarts}: resuming {ck}",
                  flush=True)
        child = subprocess.Popen(run)
        breached = False
        while child.poll() is None:
            time.sleep(a.poll_s)
            mb = rss_mb(child.pid)
            if mb > a.rss_limit_mb:
                print(f"[bounded-rss] RSS {mb:.0f} MB > "
                      f"{a.rss_limit_mb:.0f} MB — recycling the child "
                      f"(tunnel transfer-leak artifact, DESIGN.md r4 "
                      f"item 12)", flush=True)
                breached = True
                child.send_signal(signal.SIGTERM)
                try:
                    child.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    child.kill()
                    child.wait()
                break
        if not breached:
            if child.returncode == 0:
                print("[bounded-rss] stage complete", flush=True)
                return 0
            print(f"[bounded-rss] child failed rc={child.returncode} "
                  f"(not an RSS recycle — not retrying)", flush=True)
            return child.returncode
        restarts += 1
        if restarts > a.max_restarts:
            print("[bounded-rss] max_restarts exceeded", flush=True)
            return 1
        if newest(ckpt_glob) is None:
            print("[bounded-rss] no checkpoint to resume from — the "
                  "first epoch never completed under the RSS limit; "
                  "raise --rss_limit_mb", flush=True)
            return 1


if __name__ == "__main__":
    sys.exit(main())
