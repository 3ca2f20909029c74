"""Multi-process training LIFECYCLE test (VERDICT r3 item 2, SURVEY §5.3-5.4).

Beyond the step-level smoke in ``test_distributed.py``: 2 processes x 2 CPU
devices each (a 4-device global data mesh) execute the FULL trainer
lifecycle — fit epochs, validation with beam search + BLEU/WER/ACC
aggregation, process-0 checkpoint writes, SIGTERM preemption with the
coordinated (psum-agreed) stop, and cross-process resume of sharded
params + opt state + CMVN + counters — and the results are asserted equal
to a single-process 4-device run of the same schedule.
"""

import os
import re
import signal
import socket
import subprocess
import sys
import time

import pytest

from fixtures import make_corpus, train_fixture_tokenizer

WORKER = os.path.join(os.path.dirname(__file__),
                      "distributed_lifecycle_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "OPENBLAS_NUM_THREADS": "1"})
    env.pop("XLA_FLAGS", None)
    return env


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lifecycle"))
    _asr, _st, joint = make_corpus(root, n_utts=12, seconds=0.5,
                                   seconds_jitter=0.2)
    _sp, model_path = train_fixture_tokenizer(root, joint, vocab=150)
    import shutil

    shutil.copy(model_path, os.path.join(root, "tok.model"))
    return root


def _spawn_pair(phase, workdir):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    return [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), workdir,
             phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=_env(),
        )
        for i in range(2)
    ]


def _communicate(procs, timeout):
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for p in procs:
            try:
                out, _ = p.communicate(timeout=10)
                outs.append(out)
            except Exception:
                outs.append("<no output>")
        pytest.fail("lifecycle workers hung:\n" + "\n---\n".join(outs))
    combined = "\n---\n".join(outs)
    if any(p.returncode != 0 for p in procs):
        if "collectives" in combined.lower() and "gloo" in combined.lower():
            pytest.skip("jaxlib built without gloo CPU collectives:\n"
                        + combined[-500:])
        pytest.fail(
            f"worker failed (rc={[p.returncode for p in procs]}):\n"
            + combined)
    return combined


def _run_single(phase, workdir, timeout=900):
    out = subprocess.run(
        [sys.executable, WORKER, "--single", workdir, phase],
        capture_output=True, text=True, env=_env(), timeout=timeout,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def _fp(line_tag, text):
    """Extract 'FP step=.. micro=.. params=.. cmvn=..' after a tag."""
    hits = re.findall(rf"{line_tag} (FP [^\n]+)", text)
    return hits


def _fp_fields(fp):
    m = re.search(
        r"step=(\d+) micro=(\d+) params=([0-9.eE+-]+) cmvn=([0-9.]+)", fp
    )
    return (int(m.group(1)), int(m.group(2)), float(m.group(3)),
            float(m.group(4)))


def _assert_fp_close(a, b, msg, rtol=1e-5):
    """Counters exact; the params sum within float tolerance (cross-host
    all-reduce ordering differs from the single-host reduction, so the
    last bits of each step's gradient walk apart — rel ~1e-7/step)."""
    sa, ma, pa, ca = _fp_fields(a)
    sb, mb, pb, cb = _fp_fields(b)
    assert (sa, ma, ca) == (sb, mb, cb), f"{msg}:\n{a}\n{b}"
    assert abs(pa - pb) <= rtol * max(abs(pa), abs(pb)), f"{msg}:\n{a}\n{b}"


def _numbers(s):
    return [float(x) for x in re.findall(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", s)]


class TestFitParity:
    def test_two_process_fit_matches_single(self, workdir):
        procs = _spawn_pair("fit", workdir)
        combined = _communicate(procs, timeout=900)
        fps = _fp("FIT_DONE", combined)
        assert len(fps) == 2, combined
        # both processes hold the identical replicated final state
        assert fps[0] == fps[1], combined
        valids = re.findall(r"VALID (\[.*\])", combined)
        assert len(valids) == 2 and valids[0] == valids[1], combined
        # ACC/BLEU/WER actually aggregated under process_count()==2
        assert "ACC" in valids[0] and "BLEU" in valids[0], combined

        single = _run_single("fit", workdir)
        sfp = _fp("FIT_DONE", single)
        assert len(sfp) == 1, single
        _assert_fp_close(
            sfp[0], fps[0], "multi-host fit diverged from single-host"
        )
        svalid = re.findall(r"VALID (\[.*\])", single)
        assert svalid, single
        # same metric keys; values within float tolerance of the slightly
        # different parameter trajectories
        assert re.findall(r"'\w+'", svalid[0]) == re.findall(
            r"'\w+'", valids[0])
        import numpy as np

        np.testing.assert_allclose(
            _numbers(svalid[0]), _numbers(valids[0]), rtol=2e-3,
            err_msg=f"{svalid[0]}\n{valids[0]}",
        )
        # process-0 wrote usable checkpoints
        save = os.path.join(workdir, "save_fit")
        assert os.path.isdir(save) and os.listdir(save)


class TestPreemptResume:
    def test_sigterm_preempt_then_resume(self, workdir):
        procs = _spawn_pair("preempt", workdir)
        markers = [os.path.join(workdir, f"fitting_proc{i}")
                   for i in range(2)]
        deadline = time.time() + 600
        while time.time() < deadline:
            if all(os.path.exists(m) for m in markers):
                break
            if any(p.poll() is not None for p in procs):
                break  # a worker exited early; _communicate will report
            time.sleep(0.5)
        else:
            for p in procs:
                p.kill()
            pytest.fail("workers never reached the train loop")
        # both processes are mid-fit: deliver the preemption signal
        time.sleep(1.0)
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        combined = _communicate(procs, timeout=300)
        fps = _fp("PREEMPT_STOPPED", combined)
        assert len(fps) == 2, combined
        # the coordinated flag stopped BOTH processes at the SAME step
        assert fps[0] == fps[1], combined
        step = int(re.search(r"step=(\d+)", fps[0]).group(1))
        assert step >= 1, combined
        # a 'preempted' checkpoint exists
        save = os.path.join(workdir, "save_preempt")
        metas = []
        for d in os.listdir(save):
            meta = os.path.join(save, d, "meta.json")
            if os.path.isfile(meta):
                metas.append(open(meta).read())
        assert any("preempted" in m for m in metas), metas

        # ---- resume across processes ---------------------------------
        procs = _spawn_pair("resume", workdir)
        combined = _communicate(procs, timeout=900)
        resumed = _fp("RESUMED", combined)
        assert len(resumed) == 2 and resumed[0] == resumed[1], combined
        # exact state restore: fingerprint equals the preemption point
        assert resumed[0] == fps[0], (
            f"resume did not restore the preempted state:\n"
            f"saved   {fps[0]}\nresumed {resumed[0]}"
        )
        done = _fp("RESUME_DONE", combined)
        assert len(done) == 2 and done[0] == done[1], combined
        end_step = int(re.search(r"step=(\d+)", done[0]).group(1))
        assert end_step > step, (step, end_step)
