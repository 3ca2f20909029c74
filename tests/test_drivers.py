"""Wiring smoke tests for the top-level orchestration drivers.

The recipes they delegate to are trained/evaluated elsewhere (test_recipes,
test_e2e); these verify the drivers expand the reference's canonical
configurations correctly — including the size-preset table whose shell
original has a broken trailing else (SURVEY.md §7.4)."""

import os
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _argv_to_dict(argv):
    out = {}
    for a in argv[1:]:
        assert a.startswith("--"), a
        k, _, v = a[2:].partition("=")
        out[k] = v
    return out


class TestSizeAblationDriver:
    def test_preset_expansion(self, monkeypatch):
        sys.path.insert(0, os.path.join(ROOT, "ablations"))
        import run_m_and_l_size as drv

        captured = {}

        def fake_train(argv):
            captured["argv"] = argv

        import recipes.train_multitask as tm

        monkeypatch.setattr(tm, "main", fake_train)
        for size, d, ffn, lr in (("small", 256, 1024, "0.001"),
                                 ("medium", 512, 2048, "0.001"),
                                 ("large", 1024, 4096, "0.0005")):
            monkeypatch.setattr(sys, "argv", [
                "run_m_and_l_size.py", "--size", size,
                "--data_folder=/x", "--tokenizer_file=/t.model",
            ])
            drv.main()
            got = _argv_to_dict(captured["argv"])
            assert got["d_model"] == str(d)
            # the reference shell's unreachable-else d_ffn bug is fixed:
            # every size gets d_ffn = 4 * d_model
            assert got["d_ffn"] == str(ffn)
            assert got["lr_adam"] == lr
            assert captured["argv"][0].endswith(
                "transformer_multitask.yaml"
            )

    def test_large_preset_requests_pipeline(self, monkeypatch):
        sys.path.insert(0, os.path.join(ROOT, "ablations"))
        import run_m_and_l_size as drv
        import recipes.train_multitask as tm

        captured = {}
        monkeypatch.setattr(tm, "main",
                            lambda argv: captured.update(argv=argv))
        monkeypatch.setattr(sys, "argv",
                            ["run_m_and_l_size.py", "--size", "large"])
        drv.main()
        got = _argv_to_dict(captured["argv"])
        assert got["pipeline_stages"] == "2"
        assert got["grad_accumulation_factor"] == "24"


class TestDefaultDriver:
    def test_skips_tokenizer_when_present(self, tmp_path, monkeypatch,
                                          capsys):
        sys.path.insert(0, ROOT)
        import run_default as drv
        import recipes.train_multitask as tm
        import recipes.train_tokenizer as tt

        tok_dir = tmp_path / "tok"
        tok_dir.mkdir()
        (tok_dir / "5000_bpe.model").write_bytes(b"stub")
        captured = {}
        monkeypatch.setattr(tm, "main",
                            lambda argv: captured.update(train=argv))
        monkeypatch.setattr(
            tt, "main",
            lambda argv: (_ for _ in ()).throw(AssertionError(
                "tokenizer training must be skipped when the model exists"
            )),
        )
        monkeypatch.setattr(sys, "argv", [
            "run_default.py", "--data_folder", str(tmp_path),
            "--tokenizer_dir", str(tok_dir),
        ])
        drv.main()
        got = _argv_to_dict(captured["train"])
        assert got["seed"] == "3333"
        assert "skipping" in capsys.readouterr().out
