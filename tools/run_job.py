#!/usr/bin/env python
"""Local job launcher — the reference's utils/run.pl analogue.

Runs N array jobs (JOB placeholder substitution, like run.pl's JOB=1:N) in
parallel with per-job tee'd logs and a nonzero exit if any job fails:

    python tools/run_job.py --log exp/log/train.JOB.log JOB=1:4 -- \\
        python -m convtasnet_tpu.cli.train --seed JOB ...

GridEngine/SLURM submission (queue.pl analogue) is out of scope for a
single-pod TPU workflow: multi-host launches go through the cluster's own
scheduler with `python -m convtasnet_tpu.parallel.distributed` helpers
(see docs/parallelism.md).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import threading


def run_one(cmd, log_path):
    os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
    with open(log_path, "w") as log:
        log.write("# " + " ".join(cmd) + "\n")
        log.flush()
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        for line in proc.stdout:
            log.write(line)
            log.flush()
        proc.wait()
        log.write(f"# exit status {proc.returncode}\n")
        return proc.returncode


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    p = argparse.ArgumentParser("run_job")
    p.add_argument("--log", required=True, help="log path; JOB is substituted")
    p.add_argument("range", nargs="?", default=None,
                   help="JOB=lo:hi array spec (optional)")
    if "--" not in argv:
        raise SystemExit("usage: run_job.py --log LOG [JOB=1:N] -- cmd ...")
    split = argv.index("--")
    args = p.parse_args(argv[:split])
    cmd = argv[split + 1:]

    jobs = [None]
    if args.range:
        name, _, spec = args.range.partition("=")
        lo, _, hi = spec.partition(":")
        jobs = list(range(int(lo), int(hi) + 1))

    codes = {}

    def worker(j):
        sub = lambda s: s.replace("JOB", str(j)) if j is not None else s
        codes[j] = run_one([sub(c) for c in cmd], sub(args.log))

    threads = [threading.Thread(target=worker, args=(j,)) for j in jobs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bad = {j: c for j, c in codes.items() if c != 0}
    if bad:
        print(f"failed jobs: {bad}", file=sys.stderr)
        return 1
    print(f"{len(jobs)} job(s) done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
