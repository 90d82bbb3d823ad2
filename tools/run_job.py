#!/usr/bin/env python
"""Job launcher — the reference's utils/run.pl AND utils/queue.pl analogue.

Local backend (run.pl, utils/run.pl:1-30): runs N array jobs (JOB
placeholder substitution, like run.pl's JOB=1:N) in parallel with per-job
tee'd logs and a nonzero exit if any job fails:

    python tools/run_job.py --log exp/log/train.JOB.log JOB=1:4 -- \\
        python -m convtasnet_tpu.cli.train --seed JOB ...

Cluster backends (queue.pl, utils/queue.pl:13-17): --backend slurm|sge
generates one batch script whose JOB placeholder resolves to the
scheduler's array-task id (SLURM_ARRAY_TASK_ID / SGE_TASK_ID), submits it
as an array job via sbatch/qsub, and blocks until completion — the same
submit-script-and-wait contract as queue.pl's qsub -sync y. Resource
flags mirror queue.pl's (--mem, --gpu -> accelerator count, --queue
-> partition/queue name); --extra passes raw scheduler directives.
--dry_run prints the generated script and submit command without
submitting (used by tests; no cluster needed).
"""

from __future__ import annotations

import argparse
import os
import shlex
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


def run_local(cmd, log, jobs):
    codes = {}

    def worker(j):
        sub = lambda s: s.replace("JOB", str(j)) if j is not None else s
        codes[j] = run_one([sub(c) for c in cmd], sub(log))

    threads = [threading.Thread(target=worker, args=(j,)) for j in jobs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return {j: c for j, c in codes.items() if c != 0}


# --------------------------------------------------------------------------
# Cluster submission (queue.pl analogue)

_TASK_VAR = {"slurm": "SLURM_ARRAY_TASK_ID", "sge": "SGE_TASK_ID"}


def _q(s):
    """Quote a shell word; JOB expands to the task id at run time.

    Args without JOB get plain shlex quoting. Args with JOB are double-
    quoted with shell specials escaped FIRST, then JOB becomes ${JOB} —
    the one expansion the script intends (single quotes would freeze it)."""
    if "JOB" not in s:
        return shlex.quote(s)
    esc = (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("$", "\\$").replace("`", "\\`"))
    return '"' + esc.replace("JOB", "${JOB}") + '"'


def make_batch_script(backend, cmd, log, args):
    """One array-job batch script; JOB becomes the scheduler task-id var."""
    body = " ".join(_q(c) for c in cmd)
    log_sub = _q(log)
    lines = ["#!/usr/bin/env bash"]
    if backend == "slurm":
        if args.queue:
            lines.append(f"#SBATCH --partition={args.queue}")
        if args.mem:
            lines.append(f"#SBATCH --mem={args.mem}")
        if args.gpu:
            lines.append(f"#SBATCH --gres=gpu:{args.gpu}")
        for d in args.extra:
            lines.append(f"#SBATCH {d}")
    else:  # sge
        lines += ["#$ -cwd", "#$ -j y", "#$ -S /bin/bash"]
        if args.queue:
            lines.append(f"#$ -q {args.queue}")
        if args.mem:
            lines.append(f"#$ -l mem_free={args.mem},ram_free={args.mem}")
        if args.gpu:
            lines.append(f"#$ -l gpu={args.gpu}")
        for d in args.extra:
            lines.append(f"#$ {d}")
    lines += [
        "set -o pipefail",
        f"JOB=${{{_TASK_VAR[backend]}}}",
        f"mkdir -p \"$(dirname {log_sub})\"",
        # queue.pl contract: the job's stdout+stderr land in --log.
        f"( {body} ) > {log_sub} 2>&1",
        "ret=$?",
        f"echo \"# exit status $ret\" >> {log_sub}",
        "exit $ret",
        "",
    ]
    return "\n".join(lines)


def submit_cmd(backend, script_path, jobs):
    lo, hi = jobs[0], jobs[-1]
    if backend == "slurm":
        c = ["sbatch", "--wait"]
        if jobs != [None]:
            c.append(f"--array={lo}-{hi}")
        return c + [script_path]
    c = ["qsub", "-sync", "y"]
    if jobs != [None]:
        c += ["-t", f"{lo}:{hi}"]
    return c + [script_path]


def run_cluster(backend, cmd, log, jobs, args):
    script = make_batch_script(backend, cmd, log, args)
    script_path = args.script or (
        log.replace("JOB", "array") + f".{backend}.sh")
    submit = submit_cmd(backend, script_path, jobs)
    if args.dry_run:
        print(f"# script: {script_path}")
        print(script)
        print("# submit: " + " ".join(submit))
        return {}
    os.makedirs(os.path.dirname(os.path.abspath(script_path)), exist_ok=True)
    with open(script_path, "w") as f:
        f.write(script)
    os.chmod(script_path, 0o755)
    rc = subprocess.run(submit).returncode
    return {} if rc == 0 else {"array": rc}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    p = argparse.ArgumentParser("run_job")
    p.add_argument("--log", required=True, help="log path; JOB is substituted")
    p.add_argument("--backend", default="local",
                   choices=["local", "slurm", "sge"],
                   help="local = run.pl behavior; slurm/sge = queue.pl "
                        "behavior (array-job submission, blocks until done)")
    p.add_argument("--queue", default="", help="partition (slurm) / queue (sge)")
    p.add_argument("--mem", default="", help="per-job memory request, e.g. 8G")
    p.add_argument("--gpu", default=0, type=int, help="accelerators per job")
    p.add_argument("--extra", action="append", default=[],
                   help="raw scheduler directive (repeatable)")
    p.add_argument("--script", default="",
                   help="where to write the batch script (cluster backends)")
    p.add_argument("--dry_run", action="store_true",
                   help="print the batch script + submit command, don't submit")
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

    if args.backend == "local":
        bad = run_local(cmd, args.log, jobs)
    else:
        bad = run_cluster(args.backend, cmd, args.log, jobs, args)
    if bad:
        print(f"failed jobs: {bad}", file=sys.stderr)
        return 1
    if not args.dry_run:
        print(f"{len(jobs)} job(s) done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
