"""Quintuple extraction stage (the reference's Module 2).

The reference prompts an LLM per atomic fact for structured
``RelationshipsExtractor`` output — a list of
``(startNode{name,label}, name, endNode{name,label}, t_start[], t_end[])``
(itext2kg/atom/models/schemas.py:139-204, prompt prompts.py:4-56), batched
per provider limits (langchain_output_parser.py:168-221) with retries.

Ray Data mapping: a callable-class actor pool —
``chunks.map_batches(Extractor, concurrency=N, batch_size=B)`` — whose
``__init__`` holds the expensive state (LLM client / compiled patterns) and
whose ``__call__`` maps a batch of chunks to exploded quintuple rows.  The
deterministic :class:`RuleExtractor` covers tests/benchmarks (mirroring how
the reference's own unit tests mock the LLM,
tests/atom/test_atom_matching.py:173-240); :class:`LLMQuintupleExtractor`
is the production-shaped variant (network-gated, stubbed in this sandbox).

Output columns (FIXTURES.md §3): subj_name, subj_label, pred, obj_name,
obj_label, t_start:list<str>, t_end:list<str>, atomic_fact, obs_date,
conv_id, chunk_idx, fact_idx, sort_key.
"""

from __future__ import annotations

import re

import pyarrow as pa

RAW_QUINTUPLE_SCHEMA = pa.schema(
    [
        ("subj_name", pa.large_string()),
        ("subj_label", pa.large_string()),
        ("pred", pa.large_string()),
        ("obj_name", pa.large_string()),
        ("obj_label", pa.large_string()),
        ("t_start", pa.list_(pa.large_string())),
        ("t_end", pa.list_(pa.large_string())),
        ("atomic_fact", pa.large_string()),
        ("obs_date", pa.large_string()),
        ("conv_id", pa.large_string()),
        ("chunk_idx", pa.int32()),
        ("fact_idx", pa.int32()),
        ("sort_key", pa.large_string()),
    ]
)

_S = r"(?P<s>[A-Za-z][A-Za-z .&\-]*?)"
_O = r"(?P<o>[A-Za-z][A-Za-z .&\-]*?)"
_POS = r"(?P<pos>[a-z ]+?)"
_D = r"(?P<d>[^.]+?)"

# (compiled pattern, predicate surface, subj label, obj label, temporal slot)
# slot: "start" → t_start=[d], "end" → t_end=[d], None → atemporal.
_RULES: list[tuple[str, str, str, str, str | None]] = [
    (rf"^{_S} is no longer a {_POS} at {_O} on {_D}\.$", "works at", "Person", "Organization", "end"),
    (rf"^{_S} is employed as a {_POS} at {_O} on {_D}\.$", "is employed at", "Person", "Organization", "start"),
    (rf"^{_S} is a {_POS} at {_O} on {_D}\.$", "works at", "Person", "Organization", "start"),
    (rf"^{_S} is the CEO of {_O} on {_D}\.$", "is ceo of", "Person", "Organization", "start"),
    (rf"^{_S} serves as chief executive of {_O} on {_D}\.$", "ceo of", "Person", "Organization", "start"),
    (rf"^{_S} acquired {_O} on {_D}\.$", "acquired", "Organization", "Organization", "start"),
    (rf"^{_S} bought {_O} on {_D}\.$", "bought", "Organization", "Organization", "start"),
    (rf"^{_S} lives in {_O}\.$", "lives in", "Person", "City", None),
    (rf"^{_S} resides in {_O}\.$", "resides in", "Person", "City", None),
    (rf"^{_S} codes in {_O}\.$", "codes in", "Person", "Language", None),
    (rf"^{_S} studies {_O}\.$", "studies", "Person", "Animal", None),
]


# fast template rules: (needle, predicate surface, subj label, obj label,
# temporal slot, shape).  shape: "pod" = "<S><needle><pos> at <O> on <D>.",
# "od" = "<S><needle><O> on <D>.", "o" = "<S><needle><O>." — parsed with C
# string partitioning instead of backtracking regexes (hot path: every
# transcript line; ~30x cheaper than the equivalent regex match).
_FAST_RULES = [
    (" is no longer a ", "works at", "Person", "Organization", "end", "pod"),
    (" is employed as a ", "is employed at", "Person", "Organization", "start", "pod"),
    (" is a ", "works at", "Person", "Organization", "start", "pod"),
    (" is the CEO of ", "is ceo of", "Person", "Organization", "start", "od"),
    (" serves as chief executive of ", "ceo of", "Person", "Organization", "start", "od"),
    (" acquired ", "acquired", "Organization", "Organization", "start", "od"),
    (" bought ", "bought", "Organization", "Organization", "start", "od"),
    (" lives in ", "lives in", "Person", "City", None, "o"),
    (" resides in ", "resides in", "Person", "City", None, "o"),
    (" codes in ", "codes in", "Person", "Language", None, "o"),
    (" studies ", "studies", "Person", "Animal", None, "o"),
]


class RuleExtractor:
    """Deterministic pattern extractor over the closed-world templates.

    ``STATELESS = True``: construction is trivial, so the pipeline runs it
    as plain tasks (one cached instance per worker process) instead of an
    actor pool — no pool spawn cost and no risk of the pool starving the
    upstream shuffle.  LLM-backed extractors set ``STATELESS = False`` and
    get a real actor pool (client built once per actor).

    Each non-empty line of a chunk is one atomic fact; the line text is
    attached as provenance exactly as the reference attaches the source
    fact to every relationship it yields (atom.py:181-183).

    Subclasses may instead set ``_rules`` (compiled-regex form of _RULES)
    with ``_fast = None`` to use the generic regex path.
    """

    STATELESS = True

    def __init__(self) -> None:
        self._fast = _FAST_RULES
        self._rules: list | None = None

    def _extract_line(self, line: str):
        if self._fast is None:
            return self._extract_line_regex(line)
        if not line.endswith("."):
            return None
        for needle, pred, sl, ol, slot, shape in self._fast:
            i = line.find(needle)
            if i <= 0:
                continue
            s = line[:i]
            rest = line[i + len(needle) : -1]
            d = None
            if shape == "pod":
                _pos, found, rest2 = rest.partition(" at ")
                if not found:
                    continue
                o, found, d = rest2.partition(" on ")
                if not found or not o or not d:
                    continue
            elif shape == "od":
                o, found, d = rest.partition(" on ")
                if not found or not o or not d:
                    continue
            else:
                o = rest
                if not o:
                    continue
            t_start = [d] if (slot == "start" and d) else []
            t_end = [d] if (slot == "end" and d) else []
            return (s, sl, pred, o, ol, t_start, t_end)
        return None

    def _extract_line_regex(self, line: str):
        for pat, pred, sl, ol, slot in self._rules or ():
            m = pat.match(line)
            if m is None:
                continue
            g = m.groupdict()
            t_start: list[str] = []
            t_end: list[str] = []
            if slot == "start":
                t_start = [g["d"]]
            elif slot == "end":
                t_end = [g["d"]]
            return (g["s"], sl, pred, g["o"], ol, t_start, t_end)
        return None

    def __call__(self, batch: dict) -> pa.Table:
        # row-wise with substring dispatch: measured 2.4x FASTER than a
        # pandas-vectorized explode/partition variant (object-dtype
        # DataFrame overhead dominates at this line length)
        return self._call_rowwise(batch)

    def _call_rowwise(self, batch: dict) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in RAW_QUINTUPLE_SCHEMA.names}
        texts = batch["text"]
        conv_ids = batch["conv_id"]
        chunk_idxs = batch["chunk_idx"]
        obs_dates = batch["obs_date"]
        for text, conv_id, chunk_idx, obs_date in zip(texts, conv_ids, chunk_idxs, obs_dates):
            fact_idx = 0
            for line in str(text).split("\n"):
                hit = self._extract_line(line)
                if hit is None:
                    continue  # empty-extraction path (atom.py:186)
                s, sl, pred, o, ol, t_start, t_end = hit
                cols["subj_name"].append(s)
                cols["subj_label"].append(sl)
                cols["pred"].append(pred)
                cols["obj_name"].append(o)
                cols["obj_label"].append(ol)
                cols["t_start"].append(t_start)
                cols["t_end"].append(t_end)
                cols["atomic_fact"].append(line)
                cols["obs_date"].append(str(obs_date))
                cols["conv_id"].append(str(conv_id))
                cols["chunk_idx"].append(int(chunk_idx))
                cols["fact_idx"].append(fact_idx)
                cols["sort_key"].append(f"{obs_date}|{conv_id}|{int(chunk_idx):05d}|{fact_idx:05d}")
                fact_idx += 1
        return pa.table(
            {n: pa.array(cols[n], type=RAW_QUINTUPLE_SCHEMA.field(n).type) for n in RAW_QUINTUPLE_SCHEMA.names}
        )


class EventsRuleExtractor(RuleExtractor):
    """Deterministic extractor for events-derived transcripts
    (kgray/sources/events_transcripts.py): 'User 3 did click event 42.'
    → (user 3:user, did, click:event_type).  Atemporal; the observation
    date carries the time axis.  Exactly SQL-mirrorable, giving the full
    KG pipeline an oracle-checkable path."""

    def __init__(self) -> None:
        self._fast = None
        self._rules = [
            (
                re.compile(r"^(?P<s>User \d+) did (?P<o>\w+) event \d+\.$"),
                "did",
                "user",
                "event_type",
                None,
            )
        ]


class LLMQuintupleExtractor:
    """Production-shaped LLM extractor actor.

    Mirrors the reference's client lifecycle end to end: one
    structured-output client per actor; each non-empty chunk line is one
    atomic fact, prompted with the obs-date-anchored ATOM temporal query
    (atom/models/prompts.py:4-56 via
    :func:`kgray.functions.prompts.atom_extraction_prompt`); prompts are
    provider-batched (≤40 contexts / ≤8k tokens for OpenAI,
    langchain_output_parser.py:38-71, 168-221); every request batch runs
    under the bounded exponential-backoff retry loop (:287-386, reference
    ST3) and its payloads are validated against the
    ``RelationshipsExtractor`` schema (malformed output → flat-backoff
    re-request).

    ``client_factory`` builds the per-actor client: a callable
    ``client(prompts: list[str]) -> list[payload]`` where each payload
    matches ``RelationshipsExtractorModel`` (or the injected ``schema``).
    This container has no network or LLM SDKs, so a real provider client
    cannot be built here — tests inject deterministic/flaky fakes; the Ray
    plumbing, prompting, batching, retrying and parsing are all real.
    """

    STATELESS = False

    def __init__(
        self,
        client_factory=None,
        provider: str | None = None,
        model: str | object | None = None,
        max_retries: int = 3,
        base_sleep: float = 2.0,
        sleep=None,
        schema=None,
    ):
        if client_factory is None:
            raise NotImplementedError(
                "No LLM client available in this environment; pass client_factory "
                "or use RuleExtractor."
            )
        import time as _time

        from kgray.functions.prompts import PROVIDER_CONFIGS, detect_provider
        from kgray.functions.retry import RetryPolicy
        from kgray.functions.schemas import RelationshipsExtractorModel

        self.client = client_factory()
        # provider autodetection (langchain_output_parser.py:114-155):
        # explicit provider= wins; else infer from model (object or model
        # string, falling back to the constructed client); else openai —
        # the reference's primary provider
        if provider is None:
            probe = model if model is not None else self.client
            provider = detect_provider(probe)
            if provider == "default" and model is None:
                provider = "openai"
        self.provider = provider
        cfg = PROVIDER_CONFIGS.get(provider, PROVIDER_CONFIGS["default"])
        self.max_elements = int(cfg["max_elements"])
        self.max_tokens = int(cfg["max_tokens"])
        self.policy = RetryPolicy(
            max_retries=max_retries,
            base_sleep=base_sleep,
            sleep=sleep if sleep is not None else _time.sleep,
        )
        self.schema = schema if schema is not None else RelationshipsExtractorModel

    def __call__(self, batch: dict) -> pa.Table:
        from kgray.functions.prompts import atom_extraction_prompt, split_request_batches
        from kgray.functions.retry import MalformedOutputError, with_retries
        from kgray.functions.schemas import validate_output

        # 1. one atomic fact per non-empty chunk line (atom.py:176-183)
        facts: list[tuple[str, int, str, str]] = []  # (conv, chunk, obs, line)
        for text, conv_id, chunk_idx, obs_date in zip(
            batch["text"], batch["conv_id"], batch["chunk_idx"], batch["obs_date"]
        ):
            for line in str(text).split("\n"):
                if line.strip():
                    facts.append((str(conv_id), int(chunk_idx), str(obs_date), line))

        # 2. provider-batched prompting with retries; payloads align 1:1
        prompts = [atom_extraction_prompt(line, obs) for _, _, obs, line in facts]
        outputs: list[dict] = []
        for req in split_request_batches(prompts, self.max_elements, self.max_tokens):
            # validation runs INSIDE the retried closure: a malformed
            # structured payload re-requests the batch (flat backoff),
            # exactly the reference's parse-failure path
            def request(r=req):
                payloads = self.client(r)
                if len(payloads) != len(r):
                    raise MalformedOutputError(
                        f"client returned {len(payloads)} payloads for {len(r)} prompts"
                    )
                return [validate_output(p, self.schema) for p in payloads]

            outputs.extend(with_retries(request, self.policy))

        # 3. explode validated relationships into quintuple rows; fact_idx
        # counts non-empty extractions per chunk in line order, exactly as
        # RuleExtractor assigns provenance sort keys
        cols: dict[str, list] = {name: [] for name in RAW_QUINTUPLE_SCHEMA.names}
        fact_counters: dict[tuple[str, int], int] = {}
        for (conv_id, chunk_idx, obs_date, line), out in zip(facts, outputs):
            rels = out.get("relationships", [])
            if not rels:
                continue  # empty-extraction filter (atom.py:186)
            key = (conv_id, chunk_idx)
            fact_idx = fact_counters.get(key, 0)
            fact_counters[key] = fact_idx + 1
            for rel in rels:
                cols["subj_name"].append(rel["startNode"]["name"])
                cols["subj_label"].append(rel["startNode"].get("label", ""))
                cols["pred"].append(rel["name"])
                cols["obj_name"].append(rel["endNode"]["name"])
                cols["obj_label"].append(rel["endNode"].get("label", ""))
                cols["t_start"].append([str(t) for t in rel.get("t_start", [])])
                cols["t_end"].append([str(t) for t in rel.get("t_end", [])])
                cols["atomic_fact"].append(line)
                cols["obs_date"].append(obs_date)
                cols["conv_id"].append(conv_id)
                cols["chunk_idx"].append(chunk_idx)
                cols["fact_idx"].append(fact_idx)
                cols["sort_key"].append(
                    f"{obs_date}|{conv_id}|{chunk_idx:05d}|{fact_idx:05d}"
                )
        return pa.table(
            {
                n: pa.array(cols[n], type=RAW_QUINTUPLE_SCHEMA.field(n).type)
                for n in RAW_QUINTUPLE_SCHEMA.names
            }
        )
