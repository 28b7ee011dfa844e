"""Execute the HF (transformers) CLIP/SBERT encoder paths with tiny
randomly-initialized models built from configs — no downloads, no weights.
This makes perception/encoders.py's live-encoder code COVERED code: a
signature mismatch against the installed transformers breaks here, not at
a user's first real-weights run (reference mask_gen.py:465-529,
train.py:135-150)."""

import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


def _clip_tokenizer(tmp_path):
    """Minimal character-level CLIP BPE tokenizer: every printable letter as
    both a mid-word and an end-of-word token, no merges — words tokenize to
    character runs, which is all a random-weights model needs."""
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789")
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vpath = os.path.join(tmp_path, "vocab.json")
    mpath = os.path.join(tmp_path, "merges.txt")
    with open(vpath, "w") as f:
        json.dump(vocab, f)
    with open(mpath, "w") as f:
        f.write("#version: 0.2\n")
    return transformers.CLIPTokenizer(vpath, mpath)


def _bert_tokenizer(tmp_path):
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += list("abcdefghijklmnopqrstuvwxyz")
    toks += ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    vpath = os.path.join(tmp_path, "vocab.txt")
    with open(vpath, "w") as f:
        f.write("\n".join(toks))
    return transformers.BertTokenizer(vpath)


@pytest.fixture
def tiny_clip(tmp_path):
    cfg = transformers.CLIPConfig(
        projection_dim=32,
        text_config={
            "hidden_size": 16, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "vocab_size": 128, "max_position_embeddings": 77,
        },
        vision_config={
            "hidden_size": 16, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8,
        },
    )
    model = transformers.CLIPModel(cfg).eval()
    processor = transformers.CLIPProcessor(
        image_processor=transformers.CLIPImageProcessor(
            size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
        ),
        tokenizer=_clip_tokenizer(str(tmp_path)),
    )
    return model, processor


@pytest.fixture
def tiny_bert(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=32,
    )
    return transformers.BertModel(cfg).eval(), _bert_tokenizer(str(tmp_path))


class TestHFClipEncoder:
    def test_encode_images(self, tiny_clip):
        from openobj_tpu.perception.encoders import HFClipEncoder

        model, processor = tiny_clip
        enc = HFClipEncoder(model=model, processor=processor)
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
                for _ in range(3)]
        f = enc.encode_images(imgs)
        assert f.shape == (3, 32)
        np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-5)

    def test_encode_texts(self, tiny_clip):
        from openobj_tpu.perception.encoders import HFClipEncoder

        model, processor = tiny_clip
        enc = HFClipEncoder(model=model, processor=processor)
        f = enc.encode_texts(["a ball", "the wooden chair near a window"])
        assert f.shape == (2, 32)
        np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-5)

    def test_crop_then_encode(self, tiny_clip):
        """The reference flow: padded bbox crop -> CLIP (mask_gen.py:477-529)."""
        from openobj_tpu.perception.encoders import (
            HFClipEncoder, crop_with_padding,
        )

        model, processor = tiny_clip
        enc = HFClipEncoder(model=model, processor=processor)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
        crop = crop_with_padding(img, (10, 30, 20, 50), pad=20)
        f = enc.encode_images([crop])
        assert f.shape == (1, 32) and np.isfinite(f).all()


class TestHFSbertEncoder:
    def test_encode_texts(self, tiny_bert):
        from openobj_tpu.perception.encoders import HFSbertEncoder

        model, tokenizer = tiny_bert
        enc = HFSbertEncoder(model=model, tokenizer=tokenizer)
        f = enc.encode_texts(["a chair", "sofa", "a long caption about a rug"])
        assert f.shape == (3, 24)
        np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-5)

    def test_padding_does_not_change_short_text(self, tiny_bert):
        """Mean pooling must mask pad tokens: a text encoded alone equals
        the same text encoded in a batch with a much longer one."""
        from openobj_tpu.perception.encoders import HFSbertEncoder

        model, tokenizer = tiny_bert
        enc = HFSbertEncoder(model=model, tokenizer=tokenizer)
        alone = enc.encode_texts(["cup"])[0]
        batched = enc.encode_texts(["cup", "a very very long caption here"])[0]
        np.testing.assert_allclose(alone, batched, atol=1e-5)


@pytest.fixture
def tiny_blip(tmp_path):
    cfg = transformers.BlipConfig(
        text_config={
            "hidden_size": 16, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "vocab_size": 64, "encoder_hidden_size": 16,
            "max_position_embeddings": 64,
            "bos_token_id": 2, "pad_token_id": 0, "sep_token_id": 3,
            "eos_token_id": 3,
        },
        vision_config={
            "hidden_size": 16, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8,
        },
    )
    model = transformers.BlipForConditionalGeneration(cfg).eval()
    processor = transformers.BlipProcessor(
        image_processor=transformers.BlipImageProcessor(
            size={"height": 32, "width": 32}
        ),
        tokenizer=_bert_tokenizer(str(tmp_path)),
    )
    return model, processor


class TestHFCaptioner:
    """The TAP stage's live equivalent: per-bbox crop captioning
    (reference mask_gen.py:373-427 prompts TAP with each mask's bbox)."""

    def test_caption_per_bbox(self, tiny_blip):
        from openobj_tpu.perception.encoders import HFCaptioner

        model, processor = tiny_blip
        cap = HFCaptioner(model=model, processor=processor,
                          max_new_tokens=4)
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
        out = cap(rgb, [(5, 25, 10, 40), (30, 55, 40, 75)])
        assert len(out) == 2
        assert all(isinstance(c, str) for c in out)

    def test_empty_bboxes(self, tiny_blip):
        from openobj_tpu.perception.encoders import HFCaptioner

        model, processor = tiny_blip
        cap = HFCaptioner(model=model, processor=processor)
        assert cap(np.zeros((20, 20, 3), np.uint8), []) == []

    def test_feeds_caption_subject_and_sbert(self, tiny_blip, tiny_bert):
        """Full reference caption path: caption -> leading noun chunk ->
        SBERT 384-d-analog (mask_gen.py:429-468)."""
        from openobj_tpu.perception.encoders import (
            HFCaptioner, HFSbertEncoder, caption_subject,
        )

        model, processor = tiny_blip
        cap = HFCaptioner(model=model, processor=processor,
                          max_new_tokens=4)
        rgb = np.random.default_rng(1).integers(
            0, 255, (40, 40, 3)).astype(np.uint8)
        captions = [caption_subject(c) for c in cap(rgb, [(5, 35, 5, 35)])]
        bmodel, btok = tiny_bert
        f = HFSbertEncoder(model=bmodel, tokenizer=btok).encode_texts(
            [c if c else "object" for c in captions]
        )
        assert f.shape == (1, 24) and np.isfinite(f).all()
