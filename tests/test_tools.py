import os
import subprocess
import sys

import numpy as np

from convtasnet_tpu.utils.tensor import remove_pad


def test_remove_pad_3d():
    x = np.arange(24).reshape(2, 2, 6)
    out = remove_pad(x, [4, 6])
    assert out[0].shape == (2, 4) and out[1].shape == (2, 6)
    np.testing.assert_array_equal(out[0], x[0, :, :4])


def test_remove_pad_2d():
    x = np.arange(12).reshape(2, 6)
    out = remove_pad(x, [3, 5])
    assert out[0].shape == (3,) and out[1].shape == (5,)


def test_run_job_array(tmp_path):
    log = str(tmp_path / "job.JOB.log")
    rc = subprocess.run(
        [sys.executable, "tools/run_job.py", "--log", log, "JOB=1:3", "--",
         sys.executable, "-c", "print('job JOB ok')"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert rc.returncode == 0, rc.stderr
    for j in (1, 2, 3):
        content = open(str(tmp_path / f"job.{j}.log")).read()
        assert f"job {j} ok" in content
        assert "exit status 0" in content


def test_run_job_propagates_failure(tmp_path):
    log = str(tmp_path / "f.log")
    rc = subprocess.run(
        [sys.executable, "tools/run_job.py", "--log", log, "--",
         sys.executable, "-c", "raise SystemExit(3)"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert rc.returncode == 1
    assert "failed jobs" in rc.stderr


def test_bench_scaling_tiny_mesh():
    """DP weak-scaling bench runs on the virtual mesh and reports
    efficiency rows (tools/bench_scaling.py; BASELINE.md scaling metric)."""
    from tools.bench_scaling import main as scaling_main

    rows = scaling_main(["--tiny", "--per_device_batch", "1", "--steps", "2",
                         "--max_devices", "2"])
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["audio_sps"] > 0
    assert rows[1]["global_batch"] == 2
    assert "efficiency_vs_1" in rows[1]


def test_bench_streaming_tiny():
    """Streaming latency bench runs and reports RTF rows
    (tools/bench_streaming.py)."""
    from tools.bench_streaming import main as streaming_main

    rows = streaming_main(["--tiny", "--chunks_ms", "20", "--steps", "10"])
    assert len(rows) == 1
    # Slope timing (long chain minus short chain) can legitimately round
    # to ~0 for a tiny CPU model under host-load noise — assert structure
    # and non-negativity, not a positive floor.
    assert rows[0]["latency_ms"] >= 0 and rows[0]["rtf"] >= 0
    assert "streams_per_chip_rt" in rows[0] and rows[0]["chunk_ms"] == 20.0


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from convtasnet_tpu.utils.observability import enable_compilation_cache

    # Disabled by env
    monkeypatch.setenv("CONVTASNET_COMPILE_CACHE", "0")
    assert enable_compilation_cache() is None
    # Env-pointed directory is created and configured
    cache = str(tmp_path / "xla")
    monkeypatch.setenv("CONVTASNET_COMPILE_CACHE", cache)
    import jax
    assert enable_compilation_cache() == cache
    assert os.path.isdir(cache)
    assert jax.config.jax_compilation_cache_dir == cache


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_job_slurm_dry_run(tmp_path):
    """queue.pl analogue: the slurm backend generates an array batch script
    with JOB -> SLURM_ARRAY_TASK_ID and an sbatch --wait submit line."""
    log = str(tmp_path / "q.JOB.log")
    rc = subprocess.run(
        [sys.executable, "tools/run_job.py", "--log", log,
         "--backend", "slurm", "--queue", "tpu", "--mem", "8G", "--gpu", "1",
         "--dry_run", "JOB=1:4", "--",
         "python", "-m", "convtasnet_tpu.cli.train", "--seed", "JOB"],
        capture_output=True, text=True, cwd=_repo_root())
    assert rc.returncode == 0, rc.stderr
    out = rc.stdout
    assert "#SBATCH --partition=tpu" in out
    assert "#SBATCH --mem=8G" in out
    assert "#SBATCH --gres=gpu:1" in out
    assert 'JOB=${SLURM_ARRAY_TASK_ID}' in out
    assert '--seed "${JOB}"' in out
    assert 'q.${JOB}.log' in out
    assert "sbatch --wait --array=1-4" in out


def test_run_job_sge_dry_run(tmp_path):
    log = str(tmp_path / "q.JOB.log")
    rc = subprocess.run(
        [sys.executable, "tools/run_job.py", "--log", log,
         "--backend", "sge", "--mem", "4G", "--dry_run", "JOB=2:3", "--",
         "echo", "JOB"],
        capture_output=True, text=True, cwd=_repo_root())
    assert rc.returncode == 0, rc.stderr
    assert "#$ -l mem_free=4G,ram_free=4G" in rc.stdout
    assert "JOB=${SGE_TASK_ID}" in rc.stdout
    assert "qsub -sync y -t 2:3" in rc.stdout


def test_run_job_slurm_submits_via_fake_sbatch(tmp_path):
    """End-to-end submission flow against a PATH-shimmed sbatch that runs
    the generated script once per array task — proves the script is
    executable and logs land where queue.pl's contract says."""
    shim = tmp_path / "bin"
    shim.mkdir()
    sbatch = shim / "sbatch"
    sbatch.write_text(
        "#!/usr/bin/env bash\n"
        "# fake scheduler: parse --array=LO-HI, run script per task\n"
        "arr=\"\"\n"
        "for a in \"$@\"; do case $a in --array=*) arr=${a#--array=};; esac; done\n"
        "script=${@: -1}\n"
        "lo=${arr%-*}; hi=${arr#*-}\n"
        "for t in $(seq $lo $hi); do SLURM_ARRAY_TASK_ID=$t bash $script || exit 1; done\n")
    sbatch.chmod(0o755)
    env = dict(os.environ, PATH=f"{shim}:{os.environ['PATH']}")
    log = str(tmp_path / "s.JOB.log")
    rc = subprocess.run(
        [sys.executable, "tools/run_job.py", "--log", log,
         "--script", str(tmp_path / "job.sh"), "JOB=1:3", "--backend", "slurm",
         "--", "echo", "task", "JOB"],
        capture_output=True, text=True, cwd=_repo_root(), env=env)
    assert rc.returncode == 0, rc.stderr + rc.stdout
    for t in (1, 2, 3):
        content = open(str(tmp_path / f"s.{t}.log")).read()
        assert f"task {t}" in content
        assert "exit status 0" in content
