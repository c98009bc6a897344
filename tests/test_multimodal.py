"""Multimodal plumbing: stub gating + Arrow round-trip integrity."""

from __future__ import annotations

import hashlib

import pytest

from cocktailsdb_spark.operators import multimodal
from cocktailsdb_spark.tables import load


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload(b"abc", "image")


def test_decode_fake_deterministic():
    assert multimodal.decode_payload(b"abc", "image", deterministic_fake=True) == (
        3 % 640 + 16,
        (3 * 7) % 480 + 16,
    )


def test_features_checksum_roundtrip(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    media = multimodal.media_from_documents(docs)
    feats = multimodal.extract_features(media).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 20
    for r in feats:
        payload = texts[r["media_id"]].encode("utf-8")
        assert r["checksum"] == hashlib.sha256(payload).hexdigest()
        assert r["n_bytes"] == len(payload)
        assert r["kind"] in {"image", "audio", "video"}
