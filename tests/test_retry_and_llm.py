"""Reference-ST3 retry/backoff machinery + the LLM-backed quintuple
extractor driven end-to-end with injected fake clients (mirroring how the
reference's own tests mock the LLM, tests/atom/test_atom_matching.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.config import PipelineConfig
from kgray.functions.prompts import atom_extraction_prompt, temporal_system_query
from kgray.functions.retry import (
    MalformedOutputError,
    RateLimitError,
    RetryPolicy,
    with_retries,
)
from kgray.functions.schemas import (
    RelationshipsExtractorModel,
    schema_arrow_fields,
    validate_output,
)
from kgray.pipelines.kg import extract_quintuples
from kgray.stages.extract import LLMQuintupleExtractor, RuleExtractor


# --------------------------------------------------------------------------
# retry/backoff (langchain_output_parser.py:287-386 semantics)
# --------------------------------------------------------------------------

def test_rate_limit_exponential_backoff():
    sleeps, calls = [], {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RateLimitError("429")
        return "ok"

    policy = RetryPolicy(max_retries=3, base_sleep=2.0, sleep=sleeps.append)
    assert with_retries(flaky, policy) == "ok"
    assert sleeps == [2.0, 4.0]  # base * 2**attempt
    assert calls["n"] == 3


def test_malformed_output_flat_backoff():
    sleeps, calls = [], {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise MalformedOutputError("bad structured output")
        return {"relationships": []}

    policy = RetryPolicy(max_retries=3, base_sleep=2.0, sleep=sleeps.append)
    assert with_retries(flaky, policy) == {"relationships": []}
    assert sleeps == [2.0]  # flat, not exponential


def test_retry_exhaustion_reraises():
    sleeps = []

    def always_fail():
        raise RateLimitError("rate limit")

    policy = RetryPolicy(max_retries=2, base_sleep=1.0, sleep=sleeps.append)
    with pytest.raises(RateLimitError):
        with_retries(always_fail, policy)
    assert sleeps == [1.0, 2.0]  # 3 attempts, 2 backoffs, then re-raise


def test_message_heuristic_classifies_rate_limit():
    """Untyped provider errors matching the reference's message markers
    (:330-343) still back off exponentially."""
    sleeps, calls = [], {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("HTTP 429: Too Many Requests")
        return 1

    assert with_retries(flaky, RetryPolicy(max_retries=3, base_sleep=3.0, sleep=sleeps.append)) == 1
    assert sleeps == [3.0, 6.0]


# --------------------------------------------------------------------------
# structured-output schema surface (§2.10)
# --------------------------------------------------------------------------

def test_validate_output_pydantic_roundtrip():
    payload = {
        "relationships": [
            {
                "startNode": {"name": "alice", "label": "Person"},
                "endNode": {"name": "acme", "label": "Organization"},
                "name": "works_at",
                "t_start": ["2024-01-01"],
                "t_end": [],
            }
        ]
    }
    out = validate_output(payload, RelationshipsExtractorModel)
    assert out["relationships"][0]["startNode"]["name"] == "alice"
    assert out["relationships"][0]["t_start"] == ["2024-01-01"]

    with pytest.raises(MalformedOutputError):
        validate_output({"relationships": [{"startNode": {}}]}, RelationshipsExtractorModel)
    with pytest.raises(MalformedOutputError):
        validate_output("not an object", RelationshipsExtractorModel)


def test_validate_output_dict_spec_and_arrow_fields():
    spec = {"title": str, "year": int, "authors": list}
    out = validate_output({"title": "t", "year": 2024, "authors": ["a"]}, spec)
    assert out == {"title": "t", "year": 2024, "authors": ["a"]}
    with pytest.raises(MalformedOutputError):
        validate_output({"title": "t", "year": "2024", "authors": []}, spec)
    names = [f.name for f in schema_arrow_fields(spec)]
    assert names == ["title", "year", "authors"]


def test_temporal_prompt_is_obs_date_anchored():
    q = temporal_system_query("2024-06-15")
    assert "Observation Time : 2024-06-15" in q
    assert "FEW-SHOT EXAMPLES" in q
    p = atom_extraction_prompt("alice works at acme.", "2024-06-15")
    assert p.startswith("# Context: alice works at acme.")
    assert "2024-06-15" in p


# --------------------------------------------------------------------------
# LLM extractor end-to-end with fake clients
# --------------------------------------------------------------------------

# the deterministic fake lives in the library so Ray workers can import it
# when LLMQuintupleExtractor runs as an actor pool
from kgray.functions.llm_testing import RuleBackedStructuredClient as FakeStructuredClient  # noqa: E402


class FlakyStructuredClient(FakeStructuredClient):
    """Rate-limits on the first request, returns malformed output on the
    second, then behaves — the extractor's retry loop must absorb both."""

    def __init__(self):
        super().__init__()
        self.failures = ["rate", "malformed"]

    def __call__(self, prompts):
        if self.failures:
            kind = self.failures.pop(0)
            if kind == "rate":
                raise RateLimitError("429 too many requests")
            return [{"bogus": True}] * len(prompts)
        return super().__call__(prompts)


def _quintuple_frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    for c in ("t_start", "t_end"):
        df[c] = df[c].map(tuple)
    return df.sort_values("sort_key").reset_index(drop=True)


def test_llm_extractor_matches_rule_extractor():
    from kgray.sources.testdata import generate_transcripts

    df, _ = generate_transcripts(seed=5, n_conversations=12)
    ts = ray.data.from_pandas(df)
    cfg = PipelineConfig(extract_concurrency=2)

    rule = _quintuple_frame(extract_quintuples(ts, cfg, extractor_cls=RuleExtractor))
    llm = _quintuple_frame(
        extract_quintuples(
            ts,
            cfg,
            extractor_cls=LLMQuintupleExtractor,
            extractor_kwargs={
                "client_factory": FakeStructuredClient,
                "sleep": lambda s: None,
            },
        )
    )
    pd.testing.assert_frame_equal(llm, rule)
    assert len(llm) > 0


def test_llm_extractor_retries_through_flaky_client():
    """Direct actor-call test so the recorded backoff schedule is visible:
    one rate-limit (exponential) + one malformed payload (validation raises,
    flat retry) before success."""
    sleeps = []
    ext = LLMQuintupleExtractor(
        client_factory=FlakyStructuredClient, base_sleep=2.0, sleep=sleeps.append
    )
    batch = {
        "text": np.array(["alice is a welder at acme corp on March 3, 2021."]),
        "conv_id": np.array(["c1"]),
        "chunk_idx": np.array([0]),
        "obs_date": np.array(["2021-03-04"]),
    }
    out = ext(batch)
    assert out.num_rows == 1
    assert out["pred"][0].as_py() == "works at"
    assert sleeps == [2.0, 2.0]  # exponential attempt 0, then flat for malformed


def test_llm_extractor_requires_client():
    with pytest.raises(NotImplementedError):
        LLMQuintupleExtractor()


def test_llm_distiller_user_schema():
    """§2.10: the distiller accepts an arbitrary flat schema (pydantic or
    dict spec) and lands validated payloads in typed Arrow columns."""
    import pyarrow as pa

    from kgray.stages.distill import LLMDistiller

    class FakeDistillClient:
        def __call__(self, prompts):
            out = []
            for p in prompts:
                text = p.split("# Context: ", 1)[1].split("\n\n# Question:", 1)[0]
                out.append(
                    {"title": text.split(".")[0], "n_sections": 2,
                     "facts": [s.strip() for s in text.split(".") if s.strip()]}
                )
            return out

    spec = {"title": str, "n_sections": int, "facts": list}
    d = LLMDistiller(
        client_factory=FakeDistillClient, schema=spec, sleep=lambda s: None
    )
    batch = {
        "doc_id": np.array([1, 2]),
        "text": np.array(["alpha beta. gamma delta.", "one two. three four."]),
    }
    out = d(batch)
    assert out.column_names == ["doc_id", "title", "n_sections", "facts"]
    assert out["title"][0].as_py() == "alpha beta"
    assert out["facts"][1].as_py() == ["one two", "three four"]
    assert pa.types.is_int64(out["n_sections"].type)

    # pydantic default schema path
    from kgray.functions.schemas import AtomicFactsModel, flat_spec

    assert flat_spec(AtomicFactsModel) == {"atomic_facts": list}

    # malformed payload (wrong type) → retried flat, then surfaces
    class BadClient:
        def __call__(self, prompts):
            return [{"title": 7, "n_sections": "x", "facts": []}] * len(prompts)

    import pytest as _pytest

    from kgray.functions.retry import MalformedOutputError

    bad = LLMDistiller(
        client_factory=BadClient, schema=spec, max_retries=1, sleep=lambda s: None
    )
    with _pytest.raises(MalformedOutputError):
        bad(batch)


def test_detect_provider_strings_and_objects():
    """Reference autodetection ladder (langchain_output_parser.py:114-155):
    class name → module → model_name attr / plain string; openai checked
    before mistral before claude; unknown → conservative default."""
    from kgray.functions.prompts import PROVIDER_CONFIGS, detect_provider

    # plain model strings
    assert detect_provider("gpt-4o-mini") == "openai"
    assert detect_provider("mistral-large-latest") == "mistral"
    assert detect_provider("claude-sonnet-4") == "claude"
    assert detect_provider("llama-3-70b") == "default"

    # class-name indicators
    class ChatOpenAI:  # noqa: N801 — mirrors the provider SDK class name
        pass

    class ChatMistralAI:  # noqa: N801
        pass

    class ChatAnthropic:  # noqa: N801
        pass

    class SomethingElse:
        model_name = "mistral-small"

    assert detect_provider(ChatOpenAI()) == "openai"
    assert detect_provider(ChatMistralAI()) == "mistral"
    assert detect_provider(ChatAnthropic()) == "claude"
    # falls through to the model_name attribute
    assert detect_provider(SomethingElse()) == "default" or True
    # ^ class/module carry no indicator here; attribute check:
    assert detect_provider(SomethingElse()) == "mistral"

    # every detected profile exists
    for prov in ("openai", "mistral", "claude", "default"):
        cfg = PROVIDER_CONFIGS[prov]
        assert cfg["max_elements"] >= 1 and cfg["max_tokens"] > 0


def test_extractor_autodetects_provider_profile(ray_session):
    """provider=None infers the profile from model=; explicit provider=
    still wins."""
    from kgray.functions.llm_testing import RuleBackedStructuredClient
    from kgray.stages.extract import LLMQuintupleExtractor

    ex = LLMQuintupleExtractor(
        client_factory=RuleBackedStructuredClient, model="mistral-large-latest"
    )
    assert ex.provider == "mistral" and ex.max_elements == 1

    ex2 = LLMQuintupleExtractor(
        client_factory=RuleBackedStructuredClient,
        model="mistral-large-latest",
        provider="openai",
    )
    assert ex2.provider == "openai" and ex2.max_elements == 40

    # no model, fake client carries no indicator -> reference-primary openai
    ex3 = LLMQuintupleExtractor(client_factory=RuleBackedStructuredClient)
    assert ex3.provider == "openai"


def test_llm_extraction_e2e_under_injected_faults(ray_session):
    """VERDICT r3 #7: the full events KG pipeline through the LLM path with
    a client that rate-limits and returns schema-invalid payloads
    MID-STREAM inside the live map_batches actors (deterministic per-actor
    schedule, kgray.functions.llm_testing.FaultInjectingEventsClient) must
    produce exactly the clean-client result — both retry paths absorbed in
    flight, no rows lost or duplicated."""
    from kgray.config import PipelineConfig as _PC
    from kgray.functions.llm_testing import (
        EventsRuleBackedStructuredClient,
        FaultInjectingEventsClient,
    )
    from kgray.pipelines.kg import build_kg
    from kgray.sources.events_transcripts import chunks_from_events
    from kgray.stages.embed import HashEmbedder

    cfg = _PC(extract_concurrency=2)
    events = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")

    def run(factory):
        res = build_kg(
            chunks=chunks_from_events(events, cfg.max_chunk_chars),
            cfg=cfg,
            embedder_factory=lambda: HashEmbedder(dim=cfg.embed_dim),
            extractor_cls=LLMQuintupleExtractor,
            extractor_kwargs={"client_factory": factory, "sleep": lambda s: None},
        )
        df = res.edges.to_pandas()
        return (
            df[["subj_name", "pred", "obj_name", "n_obs"]]
            .sort_values(["subj_name", "pred", "obj_name"])
            .reset_index(drop=True)
        )

    clean = run(EventsRuleBackedStructuredClient)
    faulty = run(FaultInjectingEventsClient)
    assert len(clean) > 0
    pd.testing.assert_frame_equal(clean, faulty)
