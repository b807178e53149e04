"""Unit tests for country extraction (reference: src/constraints/geo_constraints.py)."""

from entity_resolution__ray.functions.geo import (
    GEO_COUNTRIES_WHITE_LIST,
    CountryExtractor,
    undot_acronyms,
)


def test_undot_acronyms():
    # geo_constraints.py:30-46 incl. spaced-dot handling via the regex
    assert undot_acronyms("U.S.A.") == "USA"
    assert undot_acronyms("in the U.S. today") == "in the US today"
    assert undot_acronyms("E.U. law") == "EU law"
    assert undot_acronyms("") == ""
    assert undot_acronyms(None) == ""
    # not a dotted acronym: single letter+dot
    assert undot_acronyms("A. Smith") == "A. Smith"


def test_extract_canonical_countries():
    ex = CountryExtractor()
    assert ex.extract("IBM Research, USA") == ["united states"]
    assert ex.extract("ETH Zurich, Switzerland") == ["switzerland"]
    assert ex.extract("University of Tokyo, Japan") == ["japan"]
    assert ex.extract("P.R. China lab") == ["china"]
    assert ex.extract("Hong Kong University") == ["hong kong"]
    assert ex.extract("nowhere at all") == []


def test_extract_dotted_usa():
    ex = CountryExtractor()
    assert ex.extract("Berkeley, C.A., U.S.A.") == ["united states"]


def test_extract_multiple_countries_sorted():
    ex = CountryExtractor()
    got = ex.extract("joint lab of Germany and France")
    assert got == ["france", "germany"]


def test_us_acronym_case_insensitive_wordbound():
    ex = CountryExtractor()
    # \bUS\b is case-insensitive in the reference → "us" as a word triggers it
    assert ex.extract("contact us in Germany") == ["germany", "united states"]
    # but not inside a word
    assert ex.extract("USAGE in Germany") == ["germany"]


def test_whitelist_has_20_countries():
    assert len(GEO_COUNTRIES_WHITE_LIST) == 20


def test_extractor_picklable():
    import pickle

    ex = CountryExtractor()
    ex2 = pickle.loads(pickle.dumps(ex))
    assert ex2.extract("Tokyo, Japan") == ["japan"]
