"""CLI verbs: conversion utilities (serve/quantize are covered elsewhere)."""

import numpy as np
import torch

from text_generation_inference_tpu import cli


def test_convert_to_safetensors(tmp_path):
    # build a .bin checkpoint with a shared (tied) tensor
    w = torch.randn(8, 4)
    state = {"a.weight": w, "tied.weight": w, "b.weight": torch.randn(4, 2)}
    torch.save(state, tmp_path / "pytorch_model.bin")

    class Args:
        model_path = str(tmp_path)

    cli.cmd_convert_to_safetensors(Args)
    out = tmp_path / "model.safetensors"
    assert out.exists()
    from safetensors import safe_open

    with safe_open(out, framework="np") as f:
        names = set(f.keys())
        # shared storage deduped: only one of the tied pair survives
        assert "b.weight" in names
        assert len({"a.weight", "tied.weight"} & names) == 1
        np.testing.assert_allclose(
            f.get_tensor(("a.weight" if "a.weight" in names
                          else "tied.weight")), w.numpy())


def test_cli_parser_smoke():
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["--help"])
