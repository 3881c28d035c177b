"""Export nnx models to torch/diffusers weight layout.

The inverse of the loader's ``param_names_mapping`` path: dumps an nnx
module tree as a torch-convention state dict (Linear transposed, convs in
OIDHW/OIHW) so synthesized checkpoints round-trip through the real
diffusers-format loader. Used by the benchmark checkpoint synthesizer and
the checkpoint-conversion scripts (reference analog:
/root/reference/scripts/checkpoint_conversion/).
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_safetensors(path: str, tensors: dict[str, np.ndarray]) -> None:
    from safetensors.numpy import save_file

    # this safetensors build silently serialises the BASE buffer of
    # non-contiguous arrays (transposed conv/linear exports) instead of
    # raising — force contiguity or the file holds un-transposed data
    # under the transposed shape
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              path)


def export_torch_layout(model) -> dict[str, np.ndarray]:
    """Dump an nnx model's params under torch layout conventions."""
    from flax import nnx

    from fastvideo_tpu.layers.embeddings import PatchEmbed3D
    from fastvideo_tpu.layers.linear import Linear
    from fastvideo_tpu.models.vaes.autoencoder_kl import Conv2d
    from fastvideo_tpu.models.vaes.hunyuan import Conv1x1, HYCausalConv3d
    from fastvideo_tpu.models.vaes.ltx2 import LTXCausalConv3d, LTXConv1x1
    from fastvideo_tpu.models.vaes.wan import CausalConv3d

    out: dict[str, np.ndarray] = {}

    def walk(mod, prefix: str):
        for name, child in vars(mod).items():
            name = str(name)
            if name.startswith("_"):
                continue
            path = f"{prefix}{name}" if prefix else name
            if isinstance(child, PatchEmbed3D):
                # emit diffusers-style 5D conv weight for the patch embed
                k = np.asarray(child.proj.kernel.value)  # [C*pt*ph*pw, O]
                pt, ph, pw = child.patch_size
                cin = k.shape[0] // (pt * ph * pw)
                w = k.T.reshape(-1, cin, pt, ph, pw)
                out[f"{path}.weight"] = w
                out[f"{path}.bias"] = np.asarray(child.proj.bias.value)
            elif isinstance(child, Linear):
                out[f"{path}.weight"] = np.asarray(child.kernel.value).T
                if child.bias is not None:
                    out[f"{path}.bias"] = np.asarray(child.bias.value)
            elif isinstance(child, (HYCausalConv3d, LTXCausalConv3d)):
                # HF layout wraps nn.Conv3d in `.conv` (the VAE param
                # mappings strip it back on load)
                w = np.asarray(child.weight.value)  # DHWIO
                out[f"{path}.conv.weight"] = w.transpose(4, 3, 0, 1, 2)
                out[f"{path}.conv.bias"] = np.asarray(child.bias.value)
            elif isinstance(child, (CausalConv3d, Conv1x1)):
                w = np.asarray(child.weight.value)  # DHWIO
                out[f"{path}.weight"] = w.transpose(4, 3, 0, 1, 2)
                out[f"{path}.bias"] = np.asarray(child.bias.value)
            elif isinstance(child, LTXConv1x1):
                w = np.asarray(child.weight.value)  # [in, out]
                out[f"{path}.weight"] = w.T[..., None, None, None]
                out[f"{path}.bias"] = np.asarray(child.bias.value)
            elif isinstance(child, Conv2d):
                w = np.asarray(child.weight.value)  # HWIO -> OIHW
                out[f"{path}.weight"] = w.transpose(3, 2, 0, 1)
                out[f"{path}.bias"] = np.asarray(child.bias.value)
            elif isinstance(child, nnx.Module):
                walk(child, path + ".")
            elif isinstance(child, (list, nnx.List)):
                for i, item in enumerate(child):
                    if isinstance(item, nnx.Module):
                        walk(item, f"{path}.{i}.")
            elif isinstance(child, nnx.Variable):
                out[path] = np.asarray(child.value)
    walk(model, "")
    return out


def make_word_level_tokenizer(dir_: str, vocab_size: int = 128,
                              model_max_length: int = 512) -> None:
    """Write a minimal T5-style word-level fast tokenizer."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = [f"w{i}" for i in range(vocab_size - 4)]
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2, " ": 3}
    vocab.update({w: i + 4 for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    os.makedirs(dir_, exist_ok=True)
    tok.save(os.path.join(dir_, "tokenizer.json"))
    with open(os.path.join(dir_, "tokenizer_config.json"), "w") as fh:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "pad_token": "<pad>",
            "eos_token": "</s>",
            "unk_token": "<unk>",
            "model_max_length": model_max_length,
        }, fh)
