"""Execute the pretrained-BERT load path against a real HF-format checkpoint
on disk (VERDICT r3 #3).

The reference loads a pretrained BERT from disk every run
(src/dynamic_models2.py:46-55).  No network exists here, so the fixture is a
*synthetic* checkpoint written by ``transformers.BertModel.save_pretrained``
— the exact on-disk format ``load_hf_bert_params`` must parse.  Coverage:

  1. BERT-base GEOMETRY (12 layers, 12 heads, dh=64, hidden 768, ffn 3072 —
     only the vocab is shrunk to keep the fixture to ~100 MB): key-name /
     transpose / stacking correctness is proven by VALUE parity of our
     ``bert_apply`` vs the HF model's ``last_hidden_state`` on the same
     tokens, including a padded attention mask.
  2. ``cli.main --bert_dir`` end-to-end on synthetic MOSEI shards (loader →
     config-geometry resolution → tokenizer from the checkpoint's vocab.txt
     → training epoch → sweep).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from multimodal_transformer_robustness_tpu.models.bert import (
    bert_apply, load_hf_bert_params)


@pytest.fixture(scope="module")
def base_shaped_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bert_base_shaped"))
    cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(0)
    transformers.BertModel(cfg).save_pretrained(d)
    return d


def test_base_shaped_checkpoint_value_parity(base_shaped_dir):
    loaded = load_hf_bert_params(base_shaped_dir)
    assert loaded is not None
    params, cfg = loaded
    assert (cfg.num_layers, cfg.num_heads, cfg.hidden_size,
            cfg.intermediate_size) == (12, 12, 768, 3072)
    assert params["layers"]["q_w"].shape == (12, 768, 768)

    B, L = 2, 12
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (B, L))
    mask = np.ones((B, L), np.float32)
    mask[0, 9:] = 0.0  # padded row exercises the extended-mask path
    types = np.zeros((B, L), np.int64)
    types[1, 6:] = 1

    ours = bert_apply(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask), jnp.asarray(types, jnp.int32), cfg)

    hf = transformers.BertModel.from_pretrained(base_shaped_dir).eval()
    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                    token_type_ids=torch.tensor(types)).last_hidden_state

    diff = np.max(np.abs(np.asarray(ours) - theirs.numpy()))
    assert diff < 2e-4, f"loader parity broke: max abs diff {diff}"


def test_base_shaped_checkpoint_through_supernet(base_shaped_dir):
    """The 12-layer regime end-to-end through init_supernet(bert_dir=...) +
    a supernet forward (the fused-attention kernel gates at depth 12 run
    their XLA fallbacks on CPU; the on-chip bert12 cell is tracked in
    BENCH_NOTES)."""
    from multimodal_transformer_robustness_tpu import (ModelSpec, build_masks,
                                                       full_active_config)
    from multimodal_transformer_robustness_tpu.models import (init_supernet,
                                                              supernet_apply)

    spec = ModelSpec(
        modality_set=("t", "a"), orig_dimensions=(768, 10), dimension=8,
        num_heads=2, head_dim=4, layers_single_attn=1, layers_cross_attn=1,
        layers_self_attn=1, attn_dropout=(0.0, 0.0, 0.0),
        relu_dropout=0.0, res_dropout=0.0, out_dropout=0.0,
        embed_dropout=0.0, attn_mask=True, output_dim=1)
    params, frozen = init_supernet(jax.random.PRNGKey(0), spec,
                                   bert_dir=base_shaped_dir)
    assert frozen["bert"]["layers"]["q_w"].shape[0] == 12
    B, L, T = 2, 8, 5
    rng = np.random.default_rng(0)
    text = jnp.asarray(np.stack([rng.integers(0, 512, (B, L)),
                                 np.ones((B, L), np.int64),
                                 np.zeros((B, L), np.int64)]))
    audio = jnp.asarray(rng.standard_normal((B, T, 10)), jnp.float32)
    # loader resolves the checkpoint's real geometry: bert_cfg=None must not
    # fall back to BERT-base defaults (vocab 30522 would crash the gather)
    from multimodal_transformer_robustness_tpu.models.bert import BertConfig

    cfg = load_hf_bert_params(base_shaped_dir)[1]
    out = supernet_apply(spec, params, build_masks(spec, full_active_config(spec)),
                         [text, audio], frozen=frozen, bert_cfg=cfg)
    assert np.isfinite(out).all()


def test_cli_main_bert_dir_end_to_end(tmp_path):
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    from _synth import write_synth_mosei_shards, write_synth_vocab

    from multimodal_transformer_robustness_tpu.cli.main import main

    bert_dir = str(tmp_path / "bert")
    os.makedirs(bert_dir)
    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(0)
    transformers.BertModel(cfg).save_pretrained(bert_dir)
    write_synth_vocab(os.path.join(bert_dir, "vocab.txt"))

    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    write_synth_mosei_shards(data_dir, n_train=16)

    main(["--dataset", "mosei_senti", "--data_path", data_dir,
          "--bert_dir", bert_dir,
          "--attn_dropout", "0.1", "0.1", "0.0", "0.0",
          "--dimension", "8", "--num_heads", "2", "--head_dim", "4",
          "--layers_single_attn", "1", "--layers_cross_attn", "1",
          "--layers_self_attn", "1", "--batch_size", "8",
          "--num_epochs", "1", "--lr", "0.001",
          "--experiment_type", "random_sample", "--max_shards", "1",
          "--seed", "0"])
