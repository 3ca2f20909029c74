"""Training-side differential fidelity gate (VERDICT r3 item 1).

Symmetric to ``test_full_recipe_oracle.py`` (which byte-gates the inference
half): drives the REAL compiled train step and a torch mirror of the
reference's training semantics (``tests/sb_oracle.py::TorchTrainMirror`` —
``stac-st/train_multitask.py:316-368`` non-AMP branch, yaml:223-224/256-269)
from the same imported weights on the same batches and asserts:

* per-microbatch loss equality (CTC 0.3 + label-smoothed NLL 0.7, batchmean);
* per-parameter gradient parity (compared in the torch naming via
  ``export_model_state_dict``);
* a 50-optimizer-step AdamW + WarmCoolDecay trajectory match, INCLUDING
  gradient accumulation and the reference's scheduler stepping quirks:
  the first update runs at the AdamW construction lr (the scheduler is
  stepped AFTER ``optimizer.step()`` — :334-337), update ``a`` runs at
  ``value(a-1)``, and NO gradient clipping (the reference replaced
  ``check_gradients`` with ``check_loss_isfinite`` — :331-332);
* the nonfinite-skip path: a NaN boundary batch leaves parameters unchanged
  on both sides while ``optimizer_step`` (and hence the lr schedule) still
  advances, and both trajectories re-converge on the next finite step.

Known, deliberate divergence (documented, not tested for equality): when a
NON-boundary microbatch in an accumulation group is nonfinite but the
boundary microbatch is finite, the reference steps with poisoned gradients
(it only finite-checks the boundary loss, :332) while this stack's
MultiSteps+apply_if_finite skips the whole group — a bug-for-bug copy would
NaN the parameters.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sb_oracle import (
    OracleDims,
    TorchTrainMirror,
    build_oracle,
    warm_cool_decay_lr,
)

from stac_st_tpu.interop.sb_export import export_model_state_dict
from stac_st_tpu.interop.sb_import import import_model_state_dict
from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops import Fbank
from stac_st_tpu.ops.cmvn import CmvnState
from stac_st_tpu.training.optim import AdamW
from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule
from stac_st_tpu.training.step import (
    StepConfig,
    TrainState,
    _forward,
    _objectives,
    make_optimizer,
    make_train_step,
)

D, H, ENC_L, DEC_L, FFN = 32, 4, 2, 2, 64
VOCAB, N_MELS, CH = 50, 16, 8
LR = 5e-3
SCHED = dict(warmup=20, cooldown=10, total_steps=100,
             decay_factor=0.75, decay_every=10.0)
WAV_LEN = 8000  # 0.5 s -> 51 fbank frames -> 13 encoder frames
U = 8


def _make_batch(rng, B=2):
    """Static-shape batch with ragged content (reference bucket shape)."""
    sig = rng.standard_normal((B, WAV_LEN)).astype(np.float32) * 0.1
    sig_len = np.array([1.0] + [0.8] * (B - 1), np.float32)
    tok_abs = rng.integers(4, U - 2, B)  # <= 6 tokens, CTC-feasible vs 13
    tokens = np.zeros((B, U), np.int64)
    tokens_bos = np.zeros((B, U), np.int64)
    tokens_eos = np.zeros((B, U), np.int64)
    for b in range(B):
        seq = rng.integers(3, VOCAB, tok_abs[b])
        tokens[b, : tok_abs[b]] = seq
        tokens_bos[b, 0] = 1
        tokens_bos[b, 1 : tok_abs[b] + 1] = seq[: U - 1]
        tokens_eos[b, : tok_abs[b]] = seq
        tokens_eos[b, tok_abs[b]] = 2
    tok_len = tok_abs.astype(np.float32) / U
    eos_len = (tok_abs + 1).astype(np.float32) / U
    return {
        "sig": sig, "sig_len": sig_len,
        "tokens": tokens, "tokens_len": tok_len,
        "tokens_bos": tokens_bos,
        "tokens_eos": tokens_eos, "tokens_eos_len": eos_len,
    }


def _jax_batch(batch):
    return {
        k: jnp.asarray(v, jnp.int32 if v.dtype == np.int64 else v.dtype)
        for k, v in batch.items()
    }


def _build_cfg():
    # dropout 0 everywhere: the differential gate compares deterministic
    # semantics (dropout RNG cannot match across frameworks)
    cnn = ConvolutionFrontEnd(out_channels=(CH, CH), dropout=0.0)
    tfm = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=(N_MELS // 4) * CH, d_model=D, nhead=H,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L, d_ffn=FFN,
        dropout=0.0, normalize_before=True, causal=False, max_length=512,
    )
    return StepConfig(
        fbank=Fbank(n_mels=N_MELS),
        cnn=cnn, transformer=tfm,
        seq_lin=LinearHead(input_size=D, n_neurons=VOCAB),
        ctc_lin=LinearHead(input_size=D, n_neurons=VOCAB),
        specaug_opts=None, ctc_weight=0.3, label_smoothing=0.1,
        loss_reduction="batchmean", pad_index=0, blank_index=0,
    )


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(2024)
    dims = OracleDims(d_model=D, nhead=H, n_enc=ENC_L, n_dec=DEC_L,
                      d_ffn=FFN, vocab=VOCAB, n_mels=N_MELS, ch=CH)
    oracle = build_oracle(dims, seed=5)
    params = import_model_state_dict(oracle.state_dict())
    mean = rng.standard_normal(N_MELS).astype(np.float32)
    std = (0.5 + rng.random(N_MELS)).astype(np.float32)
    cmvn = CmvnState(mean=jnp.asarray(mean), std=jnp.asarray(std),
                     count=jnp.asarray(100.0))
    batches = [_make_batch(rng) for _ in range(10)]
    return dict(dims=dims, oracle=oracle, params=params,
                mean=torch.tensor(mean), std=torch.tensor(std),
                cmvn=cmvn, batches=batches)


def _mirror(setup, accum=1, schedule=True):
    import copy

    oracle = copy.deepcopy(setup["oracle"])
    return TorchTrainMirror(
        oracle, setup["mean"], setup["std"], n_mels=N_MELS, lr=LR,
        grad_accumulation_factor=accum,
        schedule_kwargs=dict(SCHED) if schedule else None,
    )


def _jax_state(setup, tx):
    # fresh copies: the train step donates its TrainState argument, which
    # would delete the module-scoped fixture buffers
    params = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), setup["params"]
    )
    cmvn = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), setup["cmvn"]
    )
    return TrainState(
        params=params, opt_state=tx.init(params), cmvn=cmvn,
        optimizer_step=jnp.zeros((), jnp.int32),
        micro_step=jnp.zeros((), jnp.int32),
    )


class TestLossAndGradientParity:
    def test_microbatch_loss(self, setup):
        cfg = _build_cfg()
        mirror = _mirror(setup, schedule=False)
        for batch in setup["batches"][:3]:
            ref = float(mirror.compute_loss(batch).detach())
            p_ctc, p_seq, _, _ = _forward(
                setup["params"], setup["cmvn"], _jax_batch(batch), cfg,
                True, False, jax.random.PRNGKey(0),
            )
            loss, _ = _objectives(p_ctc, p_seq, _jax_batch(batch), cfg)
            np.testing.assert_allclose(float(loss), ref, rtol=2e-5)

    def test_per_parameter_gradients(self, setup):
        cfg = _build_cfg()
        mirror = _mirror(setup, schedule=False)
        batch = setup["batches"][0]
        loss = mirror.compute_loss(batch)
        loss.backward()
        ref_grads = {
            name: p.grad.detach().numpy()
            for name, p in mirror.model.named_parameters()
        }

        def loss_fn(params):
            p_ctc, p_seq, _, _ = _forward(
                params, setup["cmvn"], _jax_batch(batch), cfg, True,
                False, jax.random.PRNGKey(0),
            )
            l, _ = _objectives(p_ctc, p_seq, _jax_batch(batch), cfg)
            return l

        grads = jax.grad(loss_fn)(setup["params"])
        mine = export_model_state_dict(grads)
        assert set(mine) == set(ref_grads)
        scale = max(
            float(np.max(np.abs(g))) for g in ref_grads.values()
        )
        for name, ref in ref_grads.items():
            got = np.asarray(mine[name], np.float32).reshape(ref.shape)
            np.testing.assert_allclose(
                got, ref, atol=2e-5 * scale, rtol=2e-3,
                err_msg=f"gradient mismatch at {name}",
            )


class TestOptimizerTrajectory:
    def _run_pair(self, setup, n_opt_steps, accum):
        cfg = _build_cfg()
        mirror = _mirror(setup, accum=accum)
        sched = WarmCoolDecayLRSchedule(lr=LR, **SCHED)
        tx = make_optimizer(
            AdamW(lr=LR), sched.value, grad_accumulation_factor=accum,
            max_grad_norm=None, nonfinite_patience=10,
        )
        state = _jax_state(setup, tx)
        step = make_train_step(cfg, tx)
        batches = setup["batches"]
        lr_trace = []
        for i in range(n_opt_steps * accum):
            batch = batches[i % len(batches)]
            if (i + 1) % accum == 0:
                lr_trace.append(mirror.current_lr())
            mirror.fit_batch(batch)
            state, metrics = step(
                state, _jax_batch(batch), jax.random.PRNGKey(0)
            )
        return mirror, state, lr_trace

    def _assert_params_match(self, mirror, state, rtol, atol):
        ref = {n: p.detach().numpy()
               for n, p in mirror.model.named_parameters()}
        mine = export_model_state_dict(state.params)
        for name, r in ref.items():
            got = np.asarray(mine[name], np.float32).reshape(r.shape)
            np.testing.assert_allclose(
                got, r, rtol=rtol, atol=atol,
                err_msg=f"trajectory diverged at {name}",
            )

    def test_50_step_trajectory_with_accum(self, setup):
        mirror, state, lr_trace = self._run_pair(setup, 50, accum=2)
        assert int(state.optimizer_step) == 50 == mirror.optimizer_step
        # reference stepping: attempt 1 at construction lr, a>=2 at value(a-1)
        assert lr_trace[0] == LR
        for a in range(2, 51):
            np.testing.assert_allclose(
                lr_trace[a - 1],
                warm_cool_decay_lr(a - 1, LR, **SCHED), rtol=1e-6,
            )
        # tolerance: per-step fp32 noise (~1e-6 rel in the forward) random-
        # walks through 50 AdamW updates whose per-element magnitude is
        # ~lr; atol 5e-4 is ~0.2% of the total parameter motion — tight
        # enough that any semantic drift (lr indexing, accum normalization,
        # weight-decay placement) fails by orders of magnitude.
        self._assert_params_match(mirror, state, rtol=5e-3, atol=5e-4)

    def test_nonfinite_boundary_skip(self, setup):
        cfg = _build_cfg()
        mirror = _mirror(setup, accum=1)
        sched = WarmCoolDecayLRSchedule(lr=LR, **SCHED)
        tx = make_optimizer(
            AdamW(lr=LR), sched.value, grad_accumulation_factor=1,
            max_grad_norm=None, nonfinite_patience=10,
        )
        state = _jax_state(setup, tx)
        step = make_train_step(cfg, tx)
        batches = setup["batches"]

        # two finite steps, one NaN step, two finite steps
        nan_batch = {k: v.copy() for k, v in batches[0].items()}
        nan_batch["sig"][0, 100] = np.nan
        plan = [batches[0], batches[1], nan_batch, batches[2], batches[3]]
        for i, batch in enumerate(plan):
            if i == 2:
                before_ref = {
                    n: p.detach().clone()
                    for n, p in mirror.model.named_parameters()
                }
                before_mine = jax.tree_util.tree_map(
                    lambda x: np.asarray(x), state.params
                )
            loss_ref = mirror.fit_batch(batch)
            state, metrics = step(
                state, _jax_batch(batch), jax.random.PRNGKey(0)
            )
            if i == 2:
                assert not np.isfinite(loss_ref)
                assert not np.isfinite(float(metrics["loss"]))
                # params unchanged on both sides...
                for n, p in mirror.model.named_parameters():
                    assert torch.equal(p.detach(), before_ref[n])
                flat_now = jax.tree_util.tree_leaves(state.params)
                flat_before = jax.tree_util.tree_leaves(before_mine)
                for a, b in zip(flat_now, flat_before):
                    np.testing.assert_array_equal(np.asarray(a), b)
        # ...but the attempt counter (and thus the schedule) advanced on the
        # skipped step, exactly like reference optimizer_step (:335-337)
        assert mirror.optimizer_step == 5
        assert int(state.optimizer_step) == 5
        np.testing.assert_allclose(
            mirror.current_lr(), warm_cool_decay_lr(5, LR, **SCHED),
            rtol=1e-6,
        )
        self._assert_params_match(mirror, state, rtol=5e-3, atol=5e-5)
