"""Tests for the NER tokenization stage (T1/T2 — reference:
models/ner/ner_extractor.py + token_processor.py)."""

import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution__ray.stages.ner import NERExtractor, RuleNERModel, ner_tokenize


def test_rule_model_extracts_org_gpe_cardinal():
    m = RuleNERModel()
    ents = m.extract("IBM Almaden Research Center, San Jose, Japan, 95120")
    by_label = {}
    for e in ents:
        by_label.setdefault(e["label"], []).append(e["text"])
    assert any("IBM" in t for t in by_label.get("ORG", []))
    assert "Japan" in by_label.get("GPE", [])
    assert "95120" in by_label.get("CARDINAL", [])


def test_token_processor_semantics():
    # reference: dedupe case-insensitively, rstrip ';:,', join with '; '
    ents = [
        {"text": "IBM Research;", "label": "ORG"},
        {"text": "ibm research", "label": "ORG"},  # dup (case-insensitive)
        {"text": "Japan", "label": "GPE"},
        {"text": "", "label": "ORG"},
    ]
    assert NERExtractor._tokens_labeled(ents) == "IBM Research<ORG>; Japan<GPE>"
    assert NERExtractor._tokens_plain(ents) == "IBM Research; Japan"


def test_transformer_backends_raise():
    with pytest.raises(NotImplementedError):
        NERExtractor(model_type="spacy")
    with pytest.raises(NotImplementedError):
        NERExtractor(model_type="hf")


def test_ner_stage(ray_session):
    ds = rd.from_items(
        [{"full_text": "Stanford University, United States"}, {"full_text": ""}],
        override_num_blocks=1,
    )
    out = ner_tokenize(ds).to_pandas()
    assert "affil_tokens" in out and "affil_tokens_labeled" in out
    assert "Stanford University<ORG>" in out["affil_tokens_labeled"].iloc[0]
    assert "United States<GPE>" in out["affil_tokens_labeled"].iloc[0]
    assert out["affil_tokens"].iloc[1] == ""


def test_model_factory_seam_injects_custom_backend(ray_session):
    # Defined INSIDE the test so cloudpickle ships them by VALUE: pytest test
    # modules aren't importable from Ray workers (module-level helpers here
    # would unpickle as `import test_ner` → ModuleNotFoundError and the actor
    # pool would retry forever). A real user's factory lives in an importable
    # module, so by-reference pickling works for them.
    class _FakeSpacyLikeModel:
        """Duck-typed stand-in for a real spaCy/HF backend: proves the
        model_factory seam ships a user model object into the actor pool and
        that extraction runs against IT (not the rule model)."""

        def __init__(self):
            self.loads = 1  # would be spacy.load(...) — once per actor

        def extract(self, text):
            return [{"text": w, "label": "FAKE"} for w in (text or "").split()[:2]]

    def _fake_factory():
        return _FakeSpacyLikeModel()

    ds = rd.from_items(
        [{"full_text": "alpha beta gamma"}, {"full_text": "solo"}],
        override_num_blocks=1,
    )
    out = ner_tokenize(ds, model_factory=_fake_factory).to_pandas()
    assert out["affil_tokens_labeled"].iloc[0] == "alpha<FAKE>; beta<FAKE>"
    assert out["affil_tokens_labeled"].iloc[1] == "solo<FAKE>"
    # direct construction takes the same seam (no NotImplementedError even
    # though no transformer lib is installed)
    ex = NERExtractor(model_factory=_fake_factory, backoff=None)
    assert isinstance(ex.model, _FakeSpacyLikeModel)


def test_actor_pool_loads_model_once_per_actor(ray_session):
    """The concurrency wiring contract behind the env-gated spaCy/HF
    backends: a heavy model injected via model_factory is constructed ONCE
    per pool actor (in __init__), never per batch — proven by call-count
    bookkeeping through a counter actor, with many more batches than
    actors."""
    import ray
    import ray.data as rd

    from entity_resolution__ray.stages.ner import ner_tokenize

    class _SeamCounter:
        """Plain class run as a Ray actor: counts model loads and extract calls,
        keyed by the worker pid that performed them."""

        def __init__(self):
            self.load_pids = []
            self.calls = 0

        def record_load(self, pid):
            self.load_pids.append(pid)

        def record_call(self):
            self.calls += 1

        def stats(self):
            return list(self.load_pids), self.calls


    class _CountingHeavyModel:
        def __init__(self, counter):
            import os

            self._counter = counter
            # fire-and-forget: actor-to-actor messages are ordered per caller,
            # and the test settles on the counts after consumption — a blocking
            # ray.get here could starve the small test cluster's CPU slots
            counter.record_load.remote(os.getpid())

        def extract(self, text):
            self._counter.record_call.remote()
            return [{"text": "MockCorp", "label": "ORG"}]


    class _CountingFactory:
        """Picklable factory holding the counter actor handle — the exact shape
        a user wraps around spacy.load(...)."""

        def __init__(self, counter):
            self.counter = counter

        def __call__(self):
            return _CountingHeavyModel(self.counter)


    counter = ray.remote(num_cpus=0)(_SeamCounter).remote()
    n_docs, batch_size, n_actors = 64, 4, 2  # 16 batches ≫ 2 actors
    ds = rd.from_items(
        [{"full_text": f"doc {i}"} for i in range(n_docs)],
        override_num_blocks=16,
    )
    out = ner_tokenize(
        ds, batch_size=batch_size, concurrency=(n_actors, n_actors),
        model_factory=_CountingFactory(counter),
    ).to_pandas()

    import time

    deadline = time.time() + 30
    while True:  # settle: in-flight fire-and-forget messages drain
        load_pids, calls = ray.get(counter.stats.remote())
        if calls >= n_docs or time.time() > deadline:
            break
        time.sleep(0.2)
    # one load per ACTOR (distinct worker process), not per batch or per doc
    assert 1 <= len(load_pids) <= n_actors, load_pids
    assert len(set(load_pids)) == len(load_pids), "an actor loaded twice"
    assert calls == n_docs  # every doc extracted exactly once
    assert (out["affil_tokens_labeled"] == "MockCorp<ORG>").all()
