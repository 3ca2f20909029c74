"""Symbol registry: maps reference class paths to TPU-native equivalents.

The reference hparams YAMLs instantiate ``speechbrain.*`` / ``torch.*`` /
recipe-local classes by dotted path (e.g. reference
``stac-st/hparams/transformer_multitask.yaml:173-318``). To let those YAML
files run unchanged on this framework, every such path is redirected here to
the corresponding TPU-native implementation. Unknown paths fall back to a
regular import, so user extensions keep working.

Targets are registered lazily (as ``"module:attr"`` strings) to avoid import
cycles and to keep config loading fast.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

__all__ = ["resolve_symbol", "register", "REDIRECTS"]

# reference dotted path -> "stac_st_tpu.module:attr"
REDIRECTS: Dict[str, str] = {
    # --- features / augmentation (yaml:283-302) ---
    "speechbrain.lobes.features.Fbank": "stac_st_tpu.ops.fbank:Fbank",
    "speechbrain.processing.features.InputNormalization":
        "stac_st_tpu.ops.cmvn:InputNormalization",
    "speechbrain.lobes.augment.SpecAugment":
        "stac_st_tpu.ops.specaugment:SpecAugment",
    "speechbrain.processing.speech_augmentation.SpeedPerturb":
        "stac_st_tpu.ops.speed_perturb:SpeedPerturb",
    # --- model stack (yaml:173-220) ---
    "speechbrain.lobes.models.convolution.ConvolutionFrontEnd":
        "stac_st_tpu.models.frontend:ConvolutionFrontEnd",
    "modules.TransformerMultiTask.TransformerMultiTask":
        "stac_st_tpu.models.multitask:TransformerMultiTask",
    "modules.TransformerMultiTask.EncoderWrapper":
        "stac_st_tpu.models.multitask:EncoderWrapper",
    "speechbrain.nnet.linear.Linear": "stac_st_tpu.models.multitask:LinearHead",
    "torch.nn.ModuleList": "stac_st_tpu.models.multitask:ModuleGroup",
    # --- decoding (yaml:228-251) ---
    "modules.mutitask_decoder.S2SMultiTaskTransformerBeamSearch":
        "stac_st_tpu.decoding.beam_search:MultiTaskBeamSearch",
    # --- losses (yaml:253-262) ---
    "torch.nn.LogSoftmax": "stac_st_tpu.ops.losses:LogSoftmax",
    "speechbrain.nnet.losses.ctc_loss": "stac_st_tpu.ops.ctc:ctc_loss",
    "speechbrain.nnet.losses.nll_loss": "stac_st_tpu.ops.losses:nll_loss",
    "speechbrain.nnet.losses.kldiv_loss": "stac_st_tpu.ops.losses:kldiv_loss",
    # --- optimization (yaml:223-224, 264-269) ---
    "torch.optim.AdamW": "stac_st_tpu.training.optim:AdamW",
    "torch.optim.Adam": "stac_st_tpu.training.optim:Adam",
    "speechbrain.nnet.schedulers.WarmCoolDecayLRSchedule":
        "stac_st_tpu.training.schedulers:WarmCoolDecayLRSchedule",
    "speechbrain.nnet.schedulers.NoamScheduler":
        "stac_st_tpu.training.schedulers:NoamScheduler",
    # --- activations ---
    "torch.nn.GELU": "stac_st_tpu.models.activations:GELU",
    "torch.nn.ReLU": "stac_st_tpu.models.activations:ReLU",
    "torch.nn.LeakyReLU": "stac_st_tpu.models.activations:LeakyReLU",
    "speechbrain.nnet.activations.Swish": "stac_st_tpu.models.activations:Swish",
    # --- trainer plumbing (yaml:272-319) ---
    "speechbrain.utils.checkpoints.Checkpointer":
        "stac_st_tpu.training.checkpoint:Checkpointer",
    "speechbrain.utils.epoch_loop.EpochCounter":
        "stac_st_tpu.training.lifecycle:EpochCounter",
    "speechbrain.utils.train_logger.FileTrainLogger":
        "stac_st_tpu.utils.logger:FileTrainLogger",
    "speechbrain.utils.parameter_transfer.Pretrainer":
        "stac_st_tpu.training.lifecycle:Pretrainer",
    # --- metrics (yaml:308-311) ---
    "speechbrain.utils.bleu.BLEUStats": "stac_st_tpu.utils.metrics:BLEUStats",
    "speechbrain.utils.Accuracy.AccuracyStats":
        "stac_st_tpu.utils.metrics:AccuracyStats",
    "speechbrain.utils.metric_stats.ErrorRateStats":
        "stac_st_tpu.utils.metrics:ErrorRateStats",
    # --- tokenizer (yaml:36; tokenizer yaml:32) ---
    "sentencepiece.SentencePieceProcessor":
        "stac_st_tpu.tokenizer.sentencepiece_compat:SentencePieceProcessor",
    "speechbrain.tokenizers.SentencePiece.SentencePiece":
        "stac_st_tpu.tokenizer.train:SentencePiece",
    # --- misc (yaml:23) ---
    "torch.manual_seed": "stac_st_tpu.utils.seeding:manual_seed",
}


def register(path: str, target: str) -> None:
    """Register/override a redirect (``target`` is ``"module:attr"``)."""
    REDIRECTS[path] = target


def _import_target(target: str) -> Any:
    module_name, _, attr = target.partition(":")
    module = importlib.import_module(module_name)
    obj: Any = module
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj


def resolve_symbol(path: str) -> Callable:
    """Resolve a dotted path from YAML to a callable/class."""
    if path in REDIRECTS:
        return _import_target(REDIRECTS[path])
    # plain import fallback: walk module.attr boundaries right-to-left
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj: Any = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(
        f"cannot resolve {path!r}: not in the redirect registry and not "
        f"importable. Register a TPU-native equivalent via "
        f"stac_st_tpu.config.registry.register()."
    )
