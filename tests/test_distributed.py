"""2-process jax.distributed smoke test (VERDICT r2 item 5, SURVEY §5.8).

Spawns two Python processes, each owning one CPU device, joins them with
``stac_st_tpu.parallel.distributed.init_distributed`` (the multi-host DCN
path the framework ships), and checks a cross-process psum plus one
data-parallel optimizer step with the batch sharded across processes.

Skipped cleanly when the jaxlib build has no CPU cross-process collective
backend (gloo) — the worker reports that case distinctly.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_and_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_NUM_CPU_DEVICES": "1",
        # keep BLAS single-threaded: both workers share this small host
        "OPENBLAS_NUM_THREADS": "1",
    })
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers hung:\n" + "\n".join(
            p.stdout.read() if p.stdout else "" for p in procs))

    combined = "\n---\n".join(outs)
    if any(p.returncode != 0 for p in procs):
        if ("collectives" in combined.lower()
                and "gloo" in combined.lower()):
            pytest.skip("jaxlib built without gloo CPU collectives:\n"
                        + combined[-500:])
        pytest.fail(f"worker failed (rc={[p.returncode for p in procs]}):\n"
                    + combined)
    for i in range(2):
        assert f"[proc {i}] psum ok" in combined, combined
        assert f"[proc {i}] sharded train step ok" in combined, combined
    # replicated loss identical across processes
    losses = sorted(
        line.split("loss=")[1]
        for line in combined.splitlines() if "DONE loss=" in line
    )
    assert len(losses) == 2 and losses[0] == losses[1], combined

    # the REAL trainer step ran across both processes with identical
    # (replicated) loss...
    real = [
        float(line.split("REAL_LOSS=")[1])
        for line in combined.splitlines() if "REAL_LOSS=" in line
    ]
    assert len(real) == 2 and real[0] == real[1], combined

    # ...and matches a single-process run of the same step bit-for-bit
    # modulo reduction-order rounding (the multi-host _device_batch path
    # must compute exactly what the single-host path computes)
    single = subprocess.run(
        [sys.executable, WORKER, "--single"],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    base = float(single.stdout.split("REAL_LOSS=")[1].split()[0])
    assert abs(base - real[0]) < 1e-5 * max(1.0, abs(base)), (base, real)

    # beam-search hypotheses decoded over the CROSS-PROCESS-sharded
    # encoder output (gather_to_host assembles them on every process)
    # equal the single-process decode token-for-token
    hyps = [
        line.split("REAL_HYPS=")[1]
        for line in combined.splitlines() if "REAL_HYPS=" in line
    ]
    base_hyps = single.stdout.split("REAL_HYPS=")[1].splitlines()[0]
    assert len(hyps) == 2 and hyps[0] == hyps[1] == base_hyps, (
        hyps, base_hyps)
