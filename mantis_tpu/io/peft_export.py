"""PEFT-layout adapter export: interop with the HF/peft ecosystem.

The reference saves LoRA runs as a peft adapter + the non-LoRA
trainables (reference: mantis/train/train_mllava.py:330-345 —
``model.save_pretrained`` of the PeftModel +
``non_lora_trainables.bin``; mantis/train/train_utils.py:82-124 —
``get_peft_state_maybe_zero_3`` / ``..._non_lora_...``), so a trained
adapter loads straight into ``peft.PeftModel.from_pretrained``.  This
module emits the same artifact set from the TPU trainer's functional
LoRA tree (train/lora.py):

    adapter_config.json            peft LoraConfig
    adapter_model.safetensors      lora_A/lora_B (+ DoRA magnitudes)
    non_lora_trainables.bin        torch state-dict of any non-LoRA
                                   trainables (projector etc.)

Orientation: torch ``lora_A.weight`` is [r, in] and ``lora_B.weight``
[out, r] (peft applies ``W_t + scale * B @ A`` on the [out, in]
transposed weight); our tree stores ``a``: [..., in, r] and ``b``:
[..., r, out] applied as ``W + scale * a @ b`` on [in, out] — the two
are exact transposes of each other, so export is ``a.T`` / ``b.T``
per layer.

Module naming targets the INSTALLED transformers layout (4.52+ moved
the LM under ``model.language_model``); ``legacy_layout=True`` writes
the pre-4.52 ``language_model.model.`` names the reference era used.
``target_modules`` is emitted as the full per-layer module names (not
bare suffixes) so peft wraps exactly the adapted LM linears and never
the vision tower's same-named projections.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from mantis_tpu.train.lora import LoraConfig

# our stacked-layer proj name -> HF per-layer submodule path
_PROJ_SUBMODULE = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}

# arch -> (modern LM prefix, legacy LM prefix) for the llama-family
# LM subtree that LoRA targets (train/lora.py target_names)
_LM_PREFIX = {
    "mllava": ("model.language_model.", "language_model.model."),
    "mllava_next": ("model.language_model.", "language_model.model."),
    "videollava": ("model.language_model.", "language_model.model."),
    "qwen2_vl": ("model.language_model.", "model."),
    "idefics2": ("model.text_model.", "model.text_model."),
    "idefics3": ("model.text_model.", "model.text_model."),
}


def peft_adapter_state_dict(arch: str, lora: Dict, *,
                            legacy_layout: bool = False,
                            use_dora: bool = False) -> Dict[str, Any]:
    """Flatten the functional LoRA tree to peft state-dict keys.

    Input keys look like ``language_model/layers/q_proj`` with stacked
    [L, in, r] / [L, r, out] values; output keys are
    ``base_model.model.<module>.lora_A.weight`` per layer.
    """
    if arch not in _LM_PREFIX:
        raise ValueError(
            f"no PEFT name mapping for arch {arch!r}; known: "
            f"{sorted(_LM_PREFIX)}")
    prefix = _LM_PREFIX[arch][1 if legacy_layout else 0]
    sd: Dict[str, Any] = {}
    for path, ab in lora.items():
        proj = path.split("/")[-1]
        if proj not in _PROJ_SUBMODULE:
            raise ValueError(
                f"cannot map LoRA target {path!r} to a peft module "
                f"name (known projs: {sorted(_PROJ_SUBMODULE)})")
        a = np.asarray(ab["a"], dtype=np.float32)
        b = np.asarray(ab["b"], dtype=np.float32)
        if a.ndim != 3:
            raise ValueError(
                f"expected stacked [L, in, r] adapters, got {a.shape} "
                f"for {path!r}")
        for i in range(a.shape[0]):
            mod = f"{prefix}layers.{i}.{_PROJ_SUBMODULE[proj]}"
            key = f"base_model.model.{mod}"
            sd[f"{key}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
            sd[f"{key}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
            if use_dora:
                if "m" not in ab:
                    raise ValueError(
                        f"use_dora=True but no magnitude 'm' in the "
                        f"adapter tree for {path!r}")
                sd[f"{key}.lora_magnitude_vector.weight"] = (
                    np.ascontiguousarray(
                        np.asarray(ab["m"],
                                   dtype=np.float32)[i].reshape(-1)))
    return sd


def _target_module_names(arch: str, lora: Dict,
                         legacy_layout: bool) -> list:
    prefix = _LM_PREFIX[arch][1 if legacy_layout else 0]
    names = []
    for path, ab in sorted(lora.items()):
        proj = path.split("/")[-1]
        n_layers = np.asarray(ab["a"]).shape[0]
        for i in range(n_layers):
            names.append(f"{prefix}layers.{i}.{_PROJ_SUBMODULE[proj]}")
    return names


def save_peft_adapter(arch: str, lora: Dict, lora_cfg: LoraConfig,
                      output_dir: str, *,
                      base_model_name_or_path: str = "",
                      non_lora_trainables: Optional[Dict[str, Any]]
                      = None,
                      legacy_layout: bool = False) -> str:
    """Write the reference's three LoRA artifacts to ``output_dir``.

    ``non_lora_trainables`` is a {hf_name: array} dict of trainables
    outside the adapter (the reference stores the unfrozen projector
    here, train_utils.py:103-124); the file is written even when empty,
    matching the reference's unconditional save
    (train_mllava.py:336-343).
    """
    os.makedirs(output_dir, exist_ok=True)

    sd = peft_adapter_state_dict(arch, lora,
                                 legacy_layout=legacy_layout,
                                 use_dora=lora_cfg.use_dora)
    from safetensors.numpy import save_file

    save_file(sd, os.path.join(output_dir, "adapter_model.safetensors"))

    cfg: Dict[str, Any] = {
        "peft_type": "LORA",
        "task_type": None,
        "base_model_name_or_path": base_model_name_or_path,
        "r": lora_cfg.r,
        "lora_alpha": lora_cfg.alpha,
        # deliberate deviation from the reference recipe's 0.05
        # (train_mllava.py:63-70): the jitted train step is
        # deterministic, train/lora.py has no dropout
        "lora_dropout": 0.0,
        "bias": "none",
        "fan_in_fan_out": False,
        "use_dora": lora_cfg.use_dora,
        "target_modules": _target_module_names(arch, lora,
                                               legacy_layout),
        "modules_to_save": None,
        "inference_mode": True,
    }
    try:  # prefer peft's own serializer when available (field drift)
        from peft import LoraConfig as PeftLoraConfig

        pc = PeftLoraConfig(
            r=cfg["r"], lora_alpha=cfg["lora_alpha"],
            lora_dropout=0.0, bias="none", use_dora=cfg["use_dora"],
            target_modules=cfg["target_modules"],
            base_model_name_or_path=base_model_name_or_path,
            inference_mode=True)
        pc.save_pretrained(output_dir)
    except ImportError:
        with open(os.path.join(output_dir, "adapter_config.json"),
                  "w") as f:
            json.dump(cfg, f, indent=2)

    import torch

    torch.save({k: torch.from_numpy(
                    np.asarray(v, dtype=np.float32).copy())
                for k, v in (non_lora_trainables or {}).items()},
               os.path.join(output_dir, "non_lora_trainables.bin"))
    return output_dir
