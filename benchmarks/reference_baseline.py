"""Measure the PyTorch reference's train-step throughput on this host.

The reference has no published numbers (BASELINE.md), so the rebuild
establishes its own baseline by RUNNING the reference (imported from
/root/reference, not copied).  This environment has no CUDA GPU, so the
baseline is torch-CPU — recorded as such in the output JSON.

The reference tree cannot import unmodified here (missing torchvision /
fannypack / hardcoded BERT path / absent src/models.py — see SURVEY.md §2.3
"dead/latent imports"), so we stub those modules and swap the hardcoded
pretrained-BERT load for a randomly initialized BertModel of the same
architecture (identical compute).  Our own bench does the same, keeping the
comparison apples-to-apples.

Writes BASELINE_MEASURED.json at the repo root.
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    # a None __spec__ breaks importlib.util.find_spec probes (transformers)
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def measure_reference(batch_size=16, steps=12, warmup=3, bert_layers=4):
    sys.path.insert(0, REF)
    # stubs for modules the reference imports at module scope but never uses
    # on the model path
    _stub("torchvision", models=types.SimpleNamespace(), transforms=types.SimpleNamespace())
    _stub("torchvision.transforms")
    _stub("torchvision.models")
    _stub("fannypack")
    _stub("src.dataset", Multimodal_Datasets=None)

    import torch
    from transformers import BertConfig, BertModel

    import src.dynamic_models2 as dm

    class _RandomBert(torch.nn.Module):
        """Same-architecture stand-in for the hardcoded local checkpoint
        (reference dynamic_models2.py:46)."""

        def __init__(self):
            super().__init__()
            self.model = BertModel(BertConfig(num_hidden_layers=bert_layers))

        def forward(self, text):
            input_ids, input_mask, segment_ids = (
                text[0].long(), text[1].float(), text[2].long())
            with torch.no_grad():
                return self.model(input_ids=input_ids, attention_mask=input_mask,
                                  token_type_ids=segment_ids)[0]

    dm.BertTextEncoder = _RandomBert

    torch.manual_seed(0)
    model = dm.DynamicMULTModel(
        origin_dimensions=[768, 768, 512], dimension=200, num_heads=8,
        head_dim=25, layers_single_attn=3, layers_hybrid_attn=4,
        layers_self_attn=2, attn_dropout=[0.1, 0.1, 0.0, 0.0],
        relu_dropout=0.1, res_dropout=0.3, out_dropout=0.1, embed_dropout=0.3,
        attn_mask=True, output_dim=1, modality_set=["t", "a", "v"],
        all_steps=False, stride=0, padding=0, kernel_size=0,
        experiment_type="random_sample")
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-4)
    criterion = torch.nn.L1Loss()

    B, T, L = batch_size, 50, 32
    g = torch.Generator().manual_seed(0)
    text = torch.stack([
        torch.randint(0, 30522, (B, L), generator=g),
        torch.zeros(B, L, dtype=torch.long),
        torch.ones(B, L, dtype=torch.long)])
    audio = torch.randn(B, T, 768, generator=g)
    vision = torch.randn(B, T, 512, generator=g)
    labels = torch.randn(B, 1, generator=g)

    model.train()

    def step():
        model.zero_grad()
        preds, _ = model([text, audio, vision])
        loss = criterion(preds, labels)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = (time.time() - t0) / steps
    return {
        "reference_train_step_ms": dt * 1000,
        "reference_samples_per_sec": batch_size / dt,
        "hardware": "cpu (torch, no CUDA in this environment)",
        "config": "MOSEI run.sh (d=200, H=8, Dh=25, 3/4/2 layers, B=16, "
                  f"T=50, L=32, random-init {bert_layers}-layer BERT)",
    }


if __name__ == "__main__":
    out = measure_reference()
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
