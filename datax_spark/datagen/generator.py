"""Deterministic synthetic Common-Crawl-style CDC event log (FIXTURES.md F1/F2/F4).

Pure function of (spec, seed): no wall clock, no unseeded randomness —
every run and every replay sees identical bytes. Used by the pytest
replay-equivalence suite and by BENCH (generated once, consumed at two
parallelism levels).

Layout: append-only parquet shards ``<out>/events-e<epoch>.parquet``, one
per generator epoch. Offset ranges for the tail source are (shard,
row-range); a shard is the atomic replay unit.

Also provides ``reference_apply`` — the ~20-line pure-python fold that
defines correct CDC apply semantics (last-writer-wins by LSN, deletes
remove, additive schema evolution). The engine's distributed result must
equal this fold bit-for-bit; it is the strongest correctness net
(SURVEY.md §5.3).
"""

from __future__ import annotations

import bisect
import itertools
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH0 = datetime(2026, 1, 1, 0, 0, 0)

_WORDS = (
    "data spark stream merge table batch shuffle commit snapshot schema "
    "page crawl index fetch parse token vector hash range scan filter "
    "join window state offset epoch replay lineage partition salt skew"
).split()

_LANGS = ("en", "de", "fr", "zh", "es")


@dataclass
class EventLogSpec:
    n_events: int = 10_000
    n_urls: int = 2_000
    n_domains: int = 50
    zipf_a: float = 1.3
    seed: int = 42
    n_epochs: int = 8
    evolve_at_epoch: int | None = None  # `title` column appears from this epoch
    dirty_per_epoch: int = 0  # injected malformed events per epoch (F4)
    update_p: float = 0.75  # P(update | url alive); else delete
    words_scale: int = 1  # multiplies paragraphs per page (1 = legacy bytes;
    # larger values approximate real Common-Crawl page weight for
    # compute-bound scaling benchmarks)


def _base36(n: int) -> str:
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(digits[r])
    return "".join(reversed(out))


def _make_html(
    rng: random.Random, url: str, lsn: int, title: str, words_scale: int = 1
) -> bytes:
    paras = []
    for _ in range(rng.randint(1, 4) * words_scale):
        words = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(8, 30)))
        paras.append(f"<p>{words} rev{lsn}</p>")
    body = "".join(paras)
    html = (
        f"<html><head><meta charset=\"utf-8\"><title>{title}</title>"
        f"<script>var lsn={lsn};</script><style>p{{margin:0}}</style></head>"
        f"<body><nav>home | {url}</nav><h1>{title}</h1>{body}"
        f"<footer>crawl footer</footer></body></html>"
    )
    return html.encode("utf-8")


@dataclass
class _Gen:
    spec: EventLogSpec
    rng: random.Random = field(init=False)
    urls: list[str] = field(init=False)
    weights: list[float] = field(init=False)
    langs: dict[str, str] = field(init=False)
    alive: set[str] = field(init=False, default_factory=set)

    def __post_init__(self) -> None:
        s = self.spec
        self.rng = random.Random(s.seed)
        # zipf-ranked domains; urls round-robin over domains so url rank
        # inherits domain skew (hot-domain skew is load-bearing: P4/T8).
        domains = [f"d{i:04d}.example.com" for i in range(s.n_domains)]
        self.urls = [
            f"https://{domains[i % s.n_domains]}/{_base36(i // s.n_domains)}"
            for i in range(s.n_urls)
        ]
        self.weights = [1.0 / (1 + (i % s.n_domains)) ** s.zipf_a for i in range(s.n_urls)]
        # replicate random.choices(cum_weights=...) internals with a
        # precomputed cumulative array: byte-identical choice sequence,
        # O(log n) per event instead of O(n) (choices() rebuilds the
        # cumulative list on every call — the datagen hot spot at 10^6+)
        self.cum = list(itertools.accumulate(self.weights))
        self.total = self.cum[-1] + 0.0
        self.langs = {u: self.rng.choice(_LANGS) for u in self.urls}

    def event(self, lsn: int) -> dict:
        rng, s = self.rng, self.spec
        url = self.urls[
            bisect.bisect(self.cum, rng.random() * self.total, 0, len(self.urls) - 1)
        ]
        if url not in self.alive:
            op = "I"
            self.alive.add(url)
        elif rng.random() < s.update_p:
            op = "U"
        else:
            op = "D"
            self.alive.discard(url)
        title = f"{url.rsplit('/', 1)[-1]} title r{lsn}"
        html = (
            None if op == "D" else _make_html(rng, url, lsn, title, s.words_scale)
        )
        return {
            "lsn": lsn,
            "op": op,
            "url": url,
            "warc_ts": _EPOCH0 + timedelta(seconds=lsn),
            "html": html,
            "lang": self.langs[url],
            "title": title if op != "D" else None,
        }

    def dirty_event(self, lsn: int, kind: int) -> dict:
        e = self.event(lsn)
        if kind % 3 == 0:
            e["url"] = None
        elif kind % 3 == 1:
            e["op"] = "X"
        else:
            e["lsn"] = -lsn  # LSN regression
        return e


_BASE_FIELDS = [
    ("lsn", pa.int64()),
    ("op", pa.string()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("lang", pa.string()),
]


def generate_event_log(out_dir: str | Path, spec: EventLogSpec) -> list[str]:
    """Write the event log shards; returns shard paths in replay order."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    gen = _Gen(spec)
    per_epoch = spec.n_events // spec.n_epochs
    shards: list[str] = []
    lsn = 0
    for epoch in range(spec.n_epochs):
        n = per_epoch if epoch < spec.n_epochs - 1 else spec.n_events - lsn
        events = []
        for _ in range(n):
            lsn += 1
            events.append(gen.event(lsn))
        for k in range(spec.dirty_per_epoch):
            lsn += 1
            events.append(gen.dirty_event(lsn, kind=k))
        evolved = spec.evolve_at_epoch is not None and epoch >= spec.evolve_at_epoch
        fields = list(_BASE_FIELDS) + ([("title", pa.string())] if evolved else [])
        cols = {
            name: pa.array([e[name] if name in e else None for e in events], type=typ)
            for name, typ in fields
        }
        # before the evolution epoch the column is ABSENT (not null) —
        # additive schema evolution is exercised on read (ST4).
        table = pa.table(cols)
        path = out / f"events-e{epoch:05d}.parquet"
        # small row groups are the split unit for Spark's scan — the
        # pyarrow default (~1M rows/group) makes a 2M-event shard
        # readable by only TWO tasks, serializing the whole scan+partial
        # -window phase (measured: a 45s straggler task per epoch)
        pq.write_table(table, path, row_group_size=8192)
        shards.append(str(path))
    return shards


def reference_apply(events: list[dict]) -> dict[str, dict]:
    """Pure-python CDC fold — the semantic oracle for the whole engine.

    Events must be fed in log order. Dirty events (null url, op outside
    {I,U,D}, non-positive lsn, per-key LSN regression) are skipped, which
    mirrors the engine's quarantine rules (P5/F4).
    """
    state: dict[str, dict] = {}
    applied_lsn: dict[str, int] = {}
    for e in events:
        url, op, lsn = e.get("url"), e.get("op"), e.get("lsn")
        if url is None or op not in ("I", "U", "D") or lsn is None or lsn <= 0:
            continue
        if lsn <= applied_lsn.get(url, 0):
            continue
        applied_lsn[url] = lsn
        if op == "D":
            state.pop(url, None)
        else:
            state[url] = dict(e)
    return state
