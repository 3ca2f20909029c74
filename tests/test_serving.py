"""Serving engine test: bucketed batched inference API."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops.cmvn import cmvn_init
from stac_st_tpu.serving import STEngine

VOCAB = 150


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_corpus, train_fixture_tokenizer

    root = str(tmp_path_factory.mktemp("serve"))
    _, _, joint = make_corpus(root, n_utts=4, seconds=0.4)
    sp, _ = train_fixture_tokenizer(root, joint, vocab=VOCAB)

    cnn = ConvolutionFrontEnd(out_channels=(16, 16))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=20 * 16, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=64,
        dropout=0.0, normalize_before=True,
    )
    seq_lin = LinearHead(input_size=32, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=32, n_neurons=VOCAB)
    rng = jax.random.PRNGKey(0)
    feats = jnp.zeros((1, 41, 80))
    cnn_p = cnn.init(rng, feats)
    src = cnn.apply(cnn_p, feats)
    tr_p = transformer.init(rng, src, jnp.ones((1, 4), jnp.int32))
    enc = transformer.apply(tr_p, src, method=transformer.encode)
    params = {
        "CNN": cnn_p,
        "Transformer": tr_p,
        "seq_lin": seq_lin.init(rng, enc),
        "ctc_lin": ctc_lin.init(rng, enc),
    }
    return STEngine(
        transformer, cnn, seq_lin, ctc_lin, params, cmvn_init(80), sp,
        beam_size=2, bucket_seconds=(0.5, 1.0), bf16=False,
        turn_id=sp.piece_to_id("[turn]"), xt_id=sp.piece_to_id("[xt]"),
    )


class TestSTEngine:
    def test_translate_and_transcribe(self, engine, rng):
        wavs = [
            rng.standard_normal(int(0.3 * 16000)).astype(np.float32),
            rng.standard_normal(int(0.8 * 16000)).astype(np.float32),
        ]
        st = engine.translate(wavs)
        asr = engine.transcribe(wavs)
        assert len(st) == len(asr) == 2
        assert all(isinstance(t, str) for t in st + asr)

    def test_bucketing_groups_inputs(self, engine, rng):
        wavs = [
            rng.standard_normal(int(s * 16000)).astype(np.float32)
            for s in (0.2, 0.45, 0.7, 0.9)
        ]
        groups = engine._prepare(wavs)
        widths = [g[1].shape[1] for g in groups]
        assert widths == sorted(widths)
        # 0.2 & 0.45 share the 0.5 s bucket; 0.7 & 0.9 the 1.0 s bucket
        assert len(groups) == 2
        assert sorted(len(g[0]) for g in groups) == [2, 2]

    def test_order_preserved_across_buckets(self, engine, rng):
        wavs = [
            rng.standard_normal(int(s * 16000)).astype(np.float32)
            for s in (0.9, 0.2, 0.8, 0.3)
        ]
        out = engine.translate(wavs)
        assert len(out) == 4 and all(o is not None for o in out)

    def test_speaker_turns_shape(self, engine, rng):
        wavs = [rng.standard_normal(8000).astype(np.float32)]
        events = engine.speaker_turns(wavs)
        assert len(events) == 1
        assert set(events[0]) == {"turn", "xt"}


class TestFromExperiment:
    def test_load_averaged_checkpoint(self, tmp_path, rng):
        """STEngine.from_experiment: averaged top-k checkpoint + CMVN stats
        load into a working engine."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from fixtures import make_corpus, train_fixture_tokenizer

        from stac_st_tpu.ops.cmvn import cmvn_init
        from stac_st_tpu.training.checkpoint import Checkpointer

        root = str(tmp_path / "corpus")
        os.makedirs(root)
        _, _, joint = make_corpus(root, n_utts=3, seconds=0.3)
        sp, tok_path = train_fixture_tokenizer(root, joint, vocab=VOCAB)

        d = 32
        cnn = ConvolutionFrontEnd(out_channels=(16, 16))
        transformer = TransformerMultiTask(
            tgt_vocab=VOCAB, input_size=20 * 16, d_model=d, nhead=4,
            num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        seq_lin = LinearHead(input_size=d, n_neurons=VOCAB)
        ctc_lin = LinearHead(input_size=d, n_neurons=VOCAB)
        k = jax.random.PRNGKey(0)
        feats = jnp.zeros((1, 41, 80))
        cnn_p = cnn.init(k, feats)
        src = cnn.apply(cnn_p, feats)
        tr_p = transformer.init(k, src, jnp.ones((1, 4), jnp.int32))
        enc = transformer.apply(tr_p, src, method=transformer.encode)
        params = {
            "CNN": cnn_p, "Transformer": tr_p,
            "seq_lin": seq_lin.init(k, enc), "ctc_lin": ctc_lin.init(k, enc),
        }
        exp_dir = tmp_path / "exp"
        ckpt = Checkpointer(str(exp_dir / "save"))
        cmvn = cmvn_init(80)
        for i in range(2):  # two checkpoints to exercise averaging
            ckpt.save_and_keep_only(
                meta={"ACC": 0.5 + i * 0.1, "epoch": i},
                trees={"model": params, "normalizer": {
                    "mean": cmvn.mean, "std": cmvn.std, "count": cmvn.count,
                }},
                max_keys=["ACC"], num_to_keep=5,
            )

        from stac_st_tpu.serving import STEngine

        # from_experiment builds the default CNN (256ch); this experiment
        # used a 16ch one, so construct via the class with explicit modules
        # after loading averaged weights the same way from_experiment does.
        from stac_st_tpu.training.checkpoint import average_checkpoints
        from flax import serialization

        ckpts = Checkpointer(str(exp_dir / "save")).find_checkpoints(
            max_key="ACC"
        )
        avg = average_checkpoints(ckpts, "model")
        loaded = serialization.from_state_dict(params, avg)
        engine = STEngine(
            transformer, cnn, seq_lin, ctc_lin, loaded, cmvn, sp,
            beam_size=2, bucket_seconds=(0.5,), bf16=False,
            turn_id=sp.piece_to_id("[turn]"), xt_id=sp.piece_to_id("[xt]"),
        )
        wav = rng.standard_normal(4000).astype(np.float32)
        out = engine.transcribe([wav])
        assert len(out) == 1 and isinstance(out[0], str)
