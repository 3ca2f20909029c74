"""Configuration system: hyperpyyaml-compatible loading + CLI + registry."""

from .arguments import parse_arguments
from .experiment import create_experiment_directory
from .hyperyaml import HyperYamlError, Placeholder, load_hyperpyyaml
from . import registry

__all__ = [
    "parse_arguments",
    "create_experiment_directory",
    "load_hyperpyyaml",
    "HyperYamlError",
    "Placeholder",
    "registry",
]
