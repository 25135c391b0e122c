"""Streaming video+audio+text -> sentiment inference.

Port of reference ``real-time.py``: frame loop -> face detection (MTCNN) ->
face embeddings (InceptionResnetV1/vggface2); waveform -> wav2vec2 features
+ greedy-CTC transcript; BERT tokenization; one supernet forward.

TPU serving design:
  * feature extraction backends are pluggable (``--features torch`` needs
    facenet_pytorch/torchaudio; ``--features precomputed`` loads .npy
    features; ``--features synthetic`` generates dummy features to exercise
    and time the serving path on any machine);
  * the model forward is jitted ONCE per shape bucket: sequence lengths pad
    up to power-of-two buckets so arbitrary-length clips hit a warm compiled
    program (the reference re-runs eager torch per clip);
  * per-stage latency is reported like the reference's timers
    (real-time.py:43-49).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class GreedyCTCDecoder:
    """(reference real-time.py:54-63)"""

    def __init__(self, labels, blank: int = 0):
        self.labels = labels
        self.blank = blank

    def __call__(self, emission: np.ndarray) -> str:
        indices = emission.argmax(axis=-1)
        dedup = [int(i) for i, prev in zip(indices, [None] + list(indices[:-1]))
                 if i != prev]
        return "".join(self.labels[i] for i in dedup if i != self.blank)


def torch_extractors():
    """The reference's exact extraction stack; needs facenet_pytorch +
    torchaudio (not part of the baked environment — install to use)."""
    import torch
    import torchaudio
    from facenet_pytorch import MTCNN, InceptionResnetV1

    bundle = torchaudio.pipelines.WAV2VEC2_ASR_BASE_960H
    w2v = bundle.get_model().eval()
    decoder = GreedyCTCDecoder(labels=bundle.get_labels())
    mtcnn = MTCNN(select_largest=True).eval()
    resnet = InceptionResnetV1(pretrained="vggface2").eval()

    def face_features(video_path: str) -> np.ndarray:
        import cv2

        cap = cv2.VideoCapture(video_path)
        feats = []
        success, img = cap.read()
        while success:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            face = mtcnn(img)
            if face is not None:
                with torch.no_grad():
                    feats.append(resnet(face.unsqueeze(0)).numpy()[0])
            success, img = cap.read()
        return np.stack(feats)[None] if feats else np.zeros((1, 1, 512), np.float32)

    def audio_features(audio_path: str):
        waveform, sr = torchaudio.load(audio_path)
        waveform = torchaudio.functional.resample(waveform, sr, bundle.sample_rate)
        with torch.inference_mode():
            x, lengths = w2v.feature_extractor(waveform, length=None)
            features = w2v.encoder.extract_features(x, lengths, 12)
            emission = w2v.aux(features[-1])
        transcript = decoder(emission[0].numpy()).lower().split("|")
        return features[-1].numpy(), transcript

    return face_features, audio_features


def synthetic_extractors(seed: int = 0):
    rng = np.random.default_rng(seed)

    def face_features(video_path: str) -> np.ndarray:
        return rng.standard_normal((1, 24, 512)).astype(np.float32)

    def audio_features(audio_path: str):
        return (rng.standard_normal((1, 40, 768)).astype(np.float32),
                "this is a synthetic transcript".split())

    return face_features, audio_features


def precomputed_extractors(face_npy: str, audio_npy: str, transcript: str):
    def face_features(video_path: str) -> np.ndarray:
        return np.load(face_npy).astype(np.float32)

    def audio_features(audio_path: str):
        return np.load(audio_npy).astype(np.float32), transcript.split()

    return face_features, audio_features


class StreamingPredictor:
    """Owns the jitted bucketed forward; reusable across clips."""

    def __init__(self, model_path=None, bert_dir=None, seed=0,
                 attn_impl: str = "xla", bert_int8: bool = False,
                 spec=None, bert_cfg=None):
        import jax

        from ..utils import enable_compilation_cache

        enable_compilation_cache()

        from .. import ModelSpec, build_masks, full_active_config
        from ..models import init_supernet, supernet_apply
        from ..models.bert import BertConfig
        from ..data.tokenizer import load_tokenizer

        # ``spec``/``bert_cfg`` overrides exist for tests (tiny models
        # compile in seconds); the default is the reference's MOSEI serving
        # configuration (real-time.py:118-131)
        if spec is not None and attn_impl != "xla":
            raise ValueError("attn_impl is consumed by the default ModelSpec "
                             "only; set spec.attn_impl on the override")
        self.spec = spec or ModelSpec(
            modality_set=("t", "a", "v"), orig_dimensions=(768, 768, 512),
            dimension=200, num_heads=8, head_dim=25, layers_single_attn=3,
            layers_cross_attn=4, layers_self_attn=2,
            attn_dropout=(0.1, 0.1, 0.0, 0.0), relu_dropout=0.1,
            res_dropout=0.3, out_dropout=0.1, embed_dropout=0.3,
            attn_mask=True, output_dim=1, attn_impl=attn_impl)
        if bert_dir and bert_cfg is not None:
            raise ValueError(
                "pass either bert_dir or bert_cfg, not both: the apply-time "
                "config must match the checkpoint's geometry")
        if bert_dir:
            # resolve the checkpoint's real config for APPLY time (same
            # hazard cli/main.py:223-234 guards: init would use the loaded
            # geometry while a default BertConfig() at apply time silently
            # mis-shapes heads/eps)
            from ..models.bert import load_hf_bert_params

            loaded = load_hf_bert_params(bert_dir)
            bert_cfg = loaded[1] if loaded else BertConfig(num_layers=4)
        elif bert_cfg is None:
            bert_cfg = BertConfig(num_layers=4)
        self.params, self.frozen = init_supernet(
            jax.random.PRNGKey(seed), self.spec, bert_cfg=bert_cfg,
            bert_dir=bert_dir)
        self.bert_cfg = bert_cfg
        if bert_int8 and "bert" in self.frozen:
            # serving-path weight quantization of the frozen extractor
            # (models/bert.quantize_bert_params; 2x MXU rate on v5e,
            # feature-error bounds in tests/test_bert_int8.py)
            from ..models.bert import quantize_bert_params

            self.frozen = dict(
                self.frozen, bert=quantize_bert_params(self.frozen["bert"],
                                                       attn=False))
        if model_path:
            from ..checkpoint import (import_torch_state_dict, load_checkpoint,
                                      load_reference_pickle)

            if model_path.endswith(".pt"):
                self.params = import_torch_state_dict(
                    self.spec, load_reference_pickle(model_path))
            else:
                self.params, _ = load_checkpoint(model_path)
        self.masks = build_masks(self.spec, full_active_config(self.spec))
        self.tokenizer = load_tokenizer(bert_dir)

        def fwd(params, masks, frozen, inputs):
            return supernet_apply(self.spec, params, masks, inputs,
                                  frozen=frozen, bert_cfg=self.bert_cfg,
                                  train=False)

        self._fwd = jax.jit(fwd)

    def prepare(self, text_tokens, audio_feats: np.ndarray,
                face_feats: np.ndarray):
        """Host-side stage: tokenize + bucket + pad.  Returns the [3,1,L]
        token stack and the padded audio/vision feature arrays."""
        # tokenize FIRST, bucket on the wordpiece count: OOV/long words
        # expand to several pieces, so bucketing on the whitespace word
        # count would let encode_plus silently truncate the transcript tail
        max_pos = 512 if self.bert_cfg is None else self.bert_cfg.max_position
        enc = self.tokenizer.encode_plus(" ".join(text_tokens),
                                         max_length=max_pos)
        n_real = int(sum(enc["attention_mask"]))  # CLS + pieces + SEP
        L = min(_bucket(n_real), max_pos)
        text = np.stack([[enc["input_ids"][:L]], [enc["token_type_ids"][:L]],
                         [enc["attention_mask"][:L]]])  # [3, 1, L]
        ta = _bucket(audio_feats.shape[1])
        tv = _bucket(face_feats.shape[1])
        d_a, d_v = self.spec.orig_dimensions[1], self.spec.orig_dimensions[2]
        audio = np.zeros((1, ta, d_a), np.float32)
        audio[:, : audio_feats.shape[1]] = audio_feats
        vision = np.zeros((1, tv, d_v), np.float32)
        vision[:, : face_feats.shape[1]] = face_feats
        return text, audio, vision

    def forward(self, text: np.ndarray, audio: np.ndarray,
                vision: np.ndarray) -> float:
        """Device stage: dispatch the bucketed jit + host readback (the
        float() is the only synchronization that provably waits through the
        axon tunnel — see BENCH_NOTES 'Timing protocol')."""
        import jax.numpy as jnp

        out = self._fwd(self.params, self.masks, self.frozen,
                        [jnp.asarray(text), jnp.asarray(audio),
                         jnp.asarray(vision)])
        return float(np.asarray(out)[0, 0])

    def predict(self, text_tokens, audio_feats: np.ndarray,
                face_feats: np.ndarray) -> float:
        return self.forward(*self.prepare(text_tokens, audio_feats,
                                          face_feats))


def main(argv=None):
    p = argparse.ArgumentParser(description="streaming multimodal sentiment")
    p.add_argument("--video_path", type=str, default=None)
    p.add_argument("--audio_path", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--bert_dir", type=str, default=None)
    p.add_argument("--features", choices=["torch", "synthetic", "precomputed"],
                   default="synthetic")
    p.add_argument("--face_npy", type=str, default=None)
    p.add_argument("--audio_npy", type=str, default=None)
    p.add_argument("--transcript", type=str, default="")
    p.add_argument("--repeat", type=int, default=1,
                   help="re-run the clip to show warm-path latency")
    p.add_argument("--attn_impl", choices=["xla", "flash"], default="xla")
    p.add_argument("--bert_int8", action="store_true",
                   help="int8-quantize the frozen BERT (serving-path "
                        "weight quantization; tests/test_bert_int8.py)")
    args = p.parse_args(argv)

    if args.features == "torch":
        face_fn, audio_fn = torch_extractors()
    elif args.features == "precomputed":
        face_fn, audio_fn = precomputed_extractors(
            args.face_npy, args.audio_npy, args.transcript)
    else:
        face_fn, audio_fn = synthetic_extractors()

    predictor = StreamingPredictor(args.model_path, args.bert_dir,
                                   attn_impl=args.attn_impl,
                                   bert_int8=args.bert_int8)

    for it in range(args.repeat):
        t0 = time.time()
        face = face_fn(args.video_path)
        t_face = time.time()
        audio, transcript = audio_fn(args.audio_path)
        t_audio = time.time()
        sentiment = predictor.predict(transcript, audio, face)
        t_model = time.time()
        print(f"[{it}] transcript: {' '.join(transcript)}")
        print(f"[{it}] sentiment: {sentiment:+.4f}  "
              f"(face {1000*(t_face-t0):.1f} ms, "
              f"audio {1000*(t_audio-t_face):.1f} ms, "
              f"model {1000*(t_model-t_audio):.1f} ms)")
    return predictor


def script_main(argv=None) -> None:
    """Console-script shim (see cli.main.script_main): keep exit status 0."""
    main(argv)


if __name__ == "__main__":
    main()
