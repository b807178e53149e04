"""Tests for text analysis: language ID, quality features, token counts,
fingerprints."""

import hashlib

import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.text_analysis import (
    LanguageId,
    TokenCount,
    fingerprints,
    language_id,
    quality_features,
    token_counts,
)


def test_language_id_profiles():
    lid = LanguageId()
    assert lid.classify("the cat is on the mat and it is happy") == "en"
    assert lid.classify("der Hund ist nicht mit der Katze") == "de"
    assert lid.classify("le chat est dans la maison pour le moment") == "fr"
    assert lid.classify("el perro y el gato en la casa") == "es"
    assert lid.classify("这是中文文本") == "zh"
    assert lid.classify("") == "und"
    assert lid.classify("zzz qqq xxx") == "und"


def test_language_id_stage(ray_session):
    ds = rd.from_items([{"text": "the dog and the cat is here"}, {"text": ""}])
    out = language_id(ds).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "und"]


def test_quality_features_values():
    t = pa.table({"text": ["the quick brown fox is here", "", "!!! ??? ..."]})
    out = quality_features(t).to_pylist()
    assert out[0]["n_tokens"] == 6
    assert out[0]["punct_ratio"] == 0.0
    assert out[0]["stop_ratio"] == pytest.approx(2 / 6)  # the, is
    assert out[1]["n_tokens"] == 0
    assert out[2]["punct_ratio"] > 0.5
    assert out[0]["quality_score"] > out[2]["quality_score"]


def test_token_counts():
    t = pa.table({"text": ["hello world", "internationalization!", ""]})
    out = TokenCount()(t).to_pylist()
    assert out[0]["ws_tokens"] == 2
    assert out[0]["bpe_tokens"] == 2 + 2  # hello(2) world(2) ceil(5/4)=2 each
    assert out[1]["ws_tokens"] == 1
    assert out[1]["bpe_tokens"] == -(-20 // 4) + 1  # 20-char word + "!"
    assert out[2]["ws_tokens"] == 0


def test_fingerprints(ray_session):
    # Ray Data does not preserve row order by default — key assertions by text
    ds = rd.from_items([{"text": "abc def"}, {"text": "abc def"}, {"text": "def abc"}])
    out = fingerprints(ds).to_pandas()
    md5_by_text = dict(zip(out["text"], out["md5_fp"]))
    roll_by_text = dict(zip(out["text"], out["rolling_fp"]))
    assert md5_by_text["abc def"] == hashlib.md5(b"abc def").hexdigest()
    assert (out["text"] == "abc def").sum() == 2
    assert out.loc[out["text"] == "abc def", "md5_fp"].nunique() == 1
    # rolling hash is order-sensitive
    assert out.loc[out["text"] == "abc def", "rolling_fp"].nunique() == 1
    assert roll_by_text["abc def"] != roll_by_text["def abc"]
