"""Tests for the hyperpyyaml-compatible config loader."""

import pytest

from stac_st_tpu.config import HyperYamlError, load_hyperpyyaml


def test_scalars_refs_and_arithmetic():
    doc = """
    a: 10
    b: !ref <a>
    c: !ref <a>*0.1
    d: !ref <a> + 5
    folder: results/x
    sub: !ref <folder>/save
    """
    h = load_hyperpyyaml(doc)
    assert h["b"] == 10
    assert h["c"] == pytest.approx(1.0)
    assert h["d"] == 15
    assert h["sub"] == "results/x/save"


def test_tuple_implicit_resolver():
    h = load_hyperpyyaml("shape: (8, 10, 80)\nstrides: (2, 2)\n")
    assert h["shape"] == (8, 10, 80)
    assert h["strides"] == (2, 2)


def test_placeholder_requires_override():
    doc = "data_folder: !PLACEHOLDER\nother: 1\n"
    with pytest.raises(HyperYamlError, match="data_folder"):
        load_hyperpyyaml(doc)
    h = load_hyperpyyaml(doc, overrides={"data_folder": "/tmp/x"})
    assert h["data_folder"] == "/tmp/x"


def test_new_and_name_and_object_identity():
    doc = """
    sched: !new:stac_st_tpu.training.schedulers.WarmCoolDecayLRSchedule
        lr: 0.001
        warmup: 10
        cooldown: 10
        total_steps: 100
        decay_every: !ref <total>*0.1
    total: 100
    alias: !ref <sched>
    loss: !name:stac_st_tpu.ops.losses.nll_loss
        label_smoothing: 0.1
    """
    h = load_hyperpyyaml(doc)
    assert h["alias"] is h["sched"]
    assert callable(h["loss"])
    assert h["sched"].warmup == 10


def test_override_with_yaml_semantics():
    doc = "flag: False\nnums: [1, 2]\n"
    h = load_hyperpyyaml(doc, overrides={"flag": "True", "nums": "[3, 4]"})
    assert h["flag"] is True
    assert h["nums"] == [3, 4]


def test_reference_yaml_key_surface_loads():
    """The reference's full training yaml must load unchanged."""
    path = "/root/reference/stac-st/hparams/transformer_multitask.yaml"
    with open(path) as f:
        h = load_hyperpyyaml(
            f,
            overrides={
                "data_folder": "/tmp/data",
                "tokenizer_file": "/tmp/tok.model",
                "output_folder": "/tmp/out",
            },
        )
    assert h["d_model"] == 256
    assert h["turn"] == 7 and h["xt"] == 8
    assert h["dynamic_batch_sampler"]["max_batch_ex"] == 128
    # instantiated objects arrived through the registry redirects
    assert h["modules"]["CNN"] is h["CNN"]
    assert callable(h["ctc_cost"])
    from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule

    assert isinstance(h["lr_scheduler"], WarmCoolDecayLRSchedule)
    assert h["lr_scheduler"].decay_every == pytest.approx(7500.0)


@pytest.mark.parametrize("yaml_name,overrides", [
    ("transformer_inference.yaml",
     {"pretrained_path": "/tmp/p", "inference_splits": "a/b",
      "tokenizer_file": "/tmp/t"}),
    ("transformer_only_asr.yaml",
     {"data_folder": "/tmp/d", "tokenizer_file": "/tmp/t"}),
    ("transformer_only_st.yaml",
     {"data_folder": "/tmp/d", "tokenizer_file": "/tmp/t"}),
    ("transformer_fisher_cv_xx_to_xx.yaml",
     {"data_folder": "/tmp/d", "tokenizer_file": "/tmp/t",
      "source_locale": "es", "target_locale": "en"}),
])
def test_all_reference_yamls_load(yaml_name, overrides):
    """Every reference hparams file is a frozen contract — all must load."""
    path = f"/root/reference/stac-st/hparams/{yaml_name}"
    with open(path) as f:
        h = load_hyperpyyaml(f, overrides)
    assert "tokenizer" in h


def test_parse_arguments_routes_run_opts_vs_overrides():
    """Every run-opt the trainer reads must be capturable from the CLI
    (--rng_impl & co. were once silently swallowed into overrides)."""
    from stac_st_tpu.config.arguments import parse_arguments

    hf, run_opts, overrides = parse_arguments([
        "hparams/x.yaml",
        "--rng_impl=threefry",
        "--train_attn_kernel=off",
        "--pipeline_stages=2",
        "--precision=fp32",
        "--data_parallel_count=4",
        "--distributed_backend=nccl",   # accepted-and-ignored GPU flag
        "--lr_adam=0.001",              # unknown key -> hparams override
    ])
    assert hf == "hparams/x.yaml"
    assert run_opts["rng_impl"] == "threefry"
    assert run_opts["train_attn_kernel"] == "off"
    assert run_opts["pipeline_stages"] == 2
    assert run_opts["precision"] == "fp32"
    assert run_opts["data_parallel_count"] == 4
    assert run_opts["distributed_backend"] == "nccl"
    # overrides stay raw strings; the hyperpyyaml layer types them
    assert overrides == {"lr_adam": "0.001"}
    assert "rng_impl" not in overrides
