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


def test_repetition_features_values():
    from entity_resolution__ray.stages.text_analysis import repetition_features

    t = pa.table({"text": pa.array([
        "aaa bbb\naaa bbb\nccc",          # dup line: 2/3 lines dup, chars 7 extra
        "one two three four five six",    # clean → keep
        "spam spam spam spam spam",       # top_word_frac = 1.0 → drop
        "",                                # empty → drop (n_words=0)
        None,
    ])})
    out = repetition_features(t).to_pydict()
    assert out["n_lines"] == [3, 1, 1, 0, 0]
    # doc 0: distinct 2 of 3 → dup_line_frac 1/3; dup chars 7 of 17
    assert abs(out["dup_line_frac"][0] - round(1 / 3, 6)) < 1e-9
    assert abs(out["dup_line_char_frac"][0] - round(7 / 17, 6)) < 1e-9
    assert out["keep"][1] == 1
    assert out["top_word_frac"][2] == 1.0 and out["keep"][2] == 0
    assert out["keep"][3] == 0 and out["keep"][4] == 0
    # mean word len doc 1: (3+3+5+4+4+3)/6
    assert abs(out["mean_word_len"][1] - round(22 / 6, 6)) < 1e-9


def test_repetition_filter_stage(ray_session):
    from entity_resolution__ray.stages.text_analysis import repetition_filter

    ds = rd.from_items([{"text": "good clean sentence with words"},
                        {"text": "dup\ndup\ndup\ndup"}])
    out = repetition_filter(ds).to_pandas().set_index("text", drop=False)
    assert out.loc["good clean sentence with words", "keep"] == 1
    assert out.loc["dup\ndup\ndup\ndup", "keep"] == 0
