"""Serve CLI (recipes/serve.py): train a tiny experiment, serve it over
HTTP + gRPC simultaneously through ONE shared coalescing front end, and
round-trip requests on both transports."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

VOCAB = 150


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    from fixtures import make_corpus, train_fixture_tokenizer

    tmp = tmp_path_factory.mktemp("servecli")
    root = str(tmp / "corpus")
    os.makedirs(root)
    _, st_json, joint = make_corpus(root, n_utts=6, seconds=0.4)
    sp, tok_path = train_fixture_tokenizer(root, joint, vocab=VOCAB)
    for split in ("train", "dev"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        with open(st_json) as f:
            data = json.load(f)
        with open(os.path.join(root, split, "data-st.json"), "w") as f:
            json.dump(data, f)

    out_dir = str(tmp / "exp")
    overrides = {
        "d_model": "32", "nhead": "4", "num_encoder_layers": "2",
        "num_decoder_layers": "2", "d_ffn": "64",
        "output_neurons": str(VOCAB), "number_of_epochs": "1",
        "scheduler_step_limit": "50", "n_warmup_steps": "5",
        "cooldown": "5", "grad_accumulation_factor": "1",
        "dynamic_batching": "True", "max_batch_len": "4",
        "max_batch_len_val": "4", "num_bucket": "2",
        "valid_search_interval": "100", "batch_size": "4",
        "num_workers": "0", "train_splits": "train/data-st",
        "dev_splits": "dev/data-st",
        "test_splits_4_translations": "[]",
        "test_splits_1_translations": "[]",
        "output_folder_name": out_dir, "data_folder": root,
        "tokenizer_file": tok_path,
    }
    argv = ["recipes/hparams/transformer_multitask.yaml"]
    argv += [f"--{k}={v}" for k, v in overrides.items()]
    from recipes.train_multitask import main

    main(argv)
    return os.path.join(out_dir, "8886")


class TestServeCli:
    def test_both_transports_share_one_front_end(self, experiment, rng):
        import urllib.request

        from recipes.serve import build_parser, start_servers

        args = build_parser().parse_args([
            experiment, "--transport", "both",
            "--http-port", "0", "--grpc-port", "0",
            "--beam-size", "2", "--buckets", "0.5", "--no-bf16",
            "--max-wait-ms", "30",
        ])
        front, servers = start_servers(args)
        try:
            assert len(servers) == 2
            http_srv, grpc_srv = servers
            assert all(s.front is front for s in servers)

            wav = rng.standard_normal(4000).astype(np.float32)

            # HTTP round-trip
            req = urllib.request.Request(
                f"http://127.0.0.1:{http_srv.port}/v1/transcribe",
                data=json.dumps({"audio": wav.tolist()}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                http_text = json.loads(resp.read())["text"]

            # gRPC round-trip against the same engine
            grpc = pytest.importorskip("grpc")  # noqa: F841
            from stac_st_tpu.serving_grpc import STGrpcClient

            with STGrpcClient(f"127.0.0.1:{grpc_srv.port}") as client:
                grpc_text = client.transcribe(wav, timeout=300)

            assert grpc_text == http_text
            # both requests flowed through the ONE shared front end
            assert front.stats()["requests"] == 2
        finally:
            for s in servers:
                s.close()
            front.close()

    def test_parser_defaults(self):
        from recipes.serve import build_parser

        args = build_parser().parse_args(["exp"])
        assert args.transport == "http"
        assert args.buckets == "2,4,8,16,32"
        assert not args.no_bf16
        assert not args.continuous
        assert args.slots == 8 and args.chunk == 16

    def test_continuous_mode_over_http(self, experiment, rng):
        """--continuous serves through the slot loop: the front end IS the
        ContinuousBatchingEngine, warmup compiled every bucket, and a
        request round-trips over HTTP."""
        import urllib.request

        from recipes.serve import build_parser, start_servers
        from stac_st_tpu.serving_continuous import ContinuousBatchingEngine

        args = build_parser().parse_args([
            experiment, "--transport", "http", "--http-port", "0",
            "--continuous", "--slots", "2", "--chunk", "4",
            "--buckets", "0.5", "--no-bf16", "--max-decode-tokens", "8",
        ])
        front, servers = start_servers(args)
        try:
            assert isinstance(front, ContinuousBatchingEngine)
            assert servers[0].front is front
            # warmup runs all-invalid admission groups: no fake traffic
            assert front.stats()["completed"] == 0

            wav = rng.standard_normal(4000).astype(np.float32)
            req = urllib.request.Request(
                f"http://127.0.0.1:{servers[0].port}/v1/translate",
                data=json.dumps({"audio": wav.tolist()}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                out = json.loads(resp.read())
            assert isinstance(out["text"], str)
            assert front.stats()["completed"] == 1
        finally:
            for s in servers:
                s.close()
            front.close()

    def test_continuous_composes_with_data_parallel(self):
        """--continuous + --data-parallel is a supported combination
        (the slot pool shards over the data mesh); argument validation
        passes and the failure is the missing experiment dir, not a
        rejection."""
        from recipes.serve import build_parser, start_servers

        args = build_parser().parse_args(
            ["exp-does-not-exist", "--continuous", "--data-parallel", "2",
             "--compile-cache", "off"])
        with pytest.raises(FileNotFoundError):
            start_servers(args)
