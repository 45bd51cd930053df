"""Single-process reference-semantics crawler — the correctness oracle.

A deterministic simulation of the reference's nested crawl loops
(SURVEY.md §3.1; /root/reference/crawler/stores/bhx.py:573-649) under the
engine's explicit contract: per-host politeness budgets, priority →
FIFO-by-epoch → URL order, upsert-style dedup, retry/dead-letter. The
engine's distributed schedule / seen set / records must match this oracle
EXACTLY (crawl-order + seen-set equivalence from BASELINE.json north_rule).

Pure Python + pyarrow only. Shares ``canonicalize_py`` and
``extract_text_py``/``extract_links_py`` with the engine so text is
byte-identical by construction — the tests then verify the engine's
distributed path reproduces it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from .canon import canonicalize_py, host_of_py, path_of_py, pathq_of_py
from .robots import rule_matches_py
from .extract import extract_links_py, extract_text_py, noindex_py


@dataclass
class OracleConfig:
    epoch_seconds: float = 60.0
    default_crawl_delay: float = 1.0
    max_depth: int = 6
    max_epochs: int | None = None
    priority_decay: float = 0.5
    retry_decay: float = 0.5
    max_fetch_attempts: int = 2


@dataclass
class _Entry:
    url: str
    priority: float
    depth: int
    enqueue_seq: int
    fetch_attempts: int = 0


@dataclass
class OracleResult:
    schedule: list[tuple[int, str, int, str]] = field(default_factory=list)
    # (epoch, host, slot, url)
    records: dict[str, str] = field(default_factory=dict)  # url → text
    seen: set[str] = field(default_factory=set)
    dead: list[str] = field(default_factory=list)
    epochs_run: int = 0


def _merge(frontier: dict[str, _Entry], e: _Entry) -> None:
    old = frontier.get(e.url)
    if old is None:
        frontier[e.url] = e
    else:
        frontier[e.url] = _Entry(
            url=e.url,
            priority=max(old.priority, e.priority),
            depth=min(old.depth, e.depth),
            enqueue_seq=min(old.enqueue_seq, e.enqueue_seq),
            fetch_attempts=max(old.fetch_attempts, e.fetch_attempts),
        )


def run_oracle(
    pages_path: str, seeds_path: str, robots_path: str, cfg: OracleConfig
) -> OracleResult:
    pages_t = pq.read_table(pages_path, columns=["url", "html"])
    pages = {
        canonicalize_py(u): h
        for u, h in zip(pages_t.column("url").to_pylist(), pages_t.column("html").to_pylist())
    }
    seeds_t = pq.read_table(seeds_path)
    robots_t = pq.read_table(robots_path)
    allow_lists = (
        robots_t.column("allow_prefixes").to_pylist()
        if "allow_prefixes" in robots_t.column_names
        else [()] * robots_t.num_rows
    )
    robots = {
        h: (d, tuple(p or []), tuple(a or ()))
        for h, d, p, a in zip(
            robots_t.column("host").to_pylist(),
            robots_t.column("crawl_delay").to_pylist(),
            robots_t.column("disallow_prefixes").to_pylist(),
            allow_lists,
        )
    }

    def robots_blocked(path: str, dis: tuple, allow: tuple) -> bool:
        # RFC 9309 longest-match: blocked iff longest matching Disallow is
        # strictly longer than longest matching Allow (ties allow);
        # rule_matches_py handles §2.2.3 * and trailing-$ wildcards
        d = max((len(p) for p in dis if rule_matches_py(p, path)), default=0)
        a = max((len(p) for p in allow if rule_matches_py(p, path)), default=0)
        return d > a

    frontier: dict[str, _Entry] = {}
    for u, p in zip(seeds_t.column("url").to_pylist(), seeds_t.column("priority").to_pylist()):
        cu = canonicalize_py(u)
        if host_of_py(cu):
            _merge(frontier, _Entry(cu, float(p), 0, 0))

    res = OracleResult()
    epoch = 0
    while frontier:
        if cfg.max_epochs is not None and res.epochs_run >= cfg.max_epochs:
            break

        # robots gate + group by host
        by_host: dict[str, list[_Entry]] = {}
        for e in frontier.values():
            host = host_of_py(e.url)
            delay, prefixes, allows = robots.get(host, (cfg.default_crawl_delay, (), ()))
            if delay is None:
                delay = cfg.default_crawl_delay
            if robots_blocked(pathq_of_py(e.url), prefixes, allows):
                continue  # blocked: dropped from frontier entirely
            by_host.setdefault(host, []).append(e)

        drained: list[tuple[str, int, _Entry]] = []  # (host, slot, entry)
        for host, entries in by_host.items():
            delay = robots.get(host, (cfg.default_crawl_delay, (), ()))[0]
            if delay is None:
                delay = cfg.default_crawl_delay
            budget = max(1, math.floor(cfg.epoch_seconds / delay))
            entries.sort(key=lambda e: (-e.priority, e.enqueue_seq, e.url))
            for slot, e in enumerate(entries[:budget]):
                drained.append((host, slot, e))

        if not drained:
            break

        for host, slot, e in sorted(drained, key=lambda t: (t[0], t[1])):
            res.schedule.append((epoch, host, slot, e.url))

        next_frontier: dict[str, _Entry] = {}
        # rest = allowed-but-over-budget rows survive as-is
        drained_urls = {e.url for _, _, e in drained}
        for host, entries in by_host.items():
            for e in entries:
                if e.url not in drained_urls:
                    next_frontier[e.url] = e

        # mark ALL of this epoch's first-time schedules seen BEFORE link
        # expansion — the engine filters children against the batch-updated
        # seen set, not an interleaved one
        for _, _, e in drained:
            if e.fetch_attempts == 0:
                res.seen.add(e.url)

        children: list[_Entry] = []
        for host, slot, e in drained:
            html = pages.get(e.url)
            if html is None:
                attempts = e.fetch_attempts + 1
                if attempts >= cfg.max_fetch_attempts:
                    res.dead.append(e.url)
                else:
                    children.append(
                        _Entry(e.url, e.priority * cfg.retry_decay, e.depth, epoch + 1, attempts)
                    )
                continue
            if not noindex_py(html):
                res.records[e.url] = extract_text_py(html)
            for raw in extract_links_py(html, e.url):
                cu = canonicalize_py(raw)
                if not host_of_py(cu):
                    continue
                if e.depth + 1 > cfg.max_depth:
                    continue
                if cu in res.seen:
                    continue
                children.append(
                    _Entry(cu, e.priority * cfg.priority_decay, e.depth + 1, epoch + 1, 0)
                )

        for c in children:
            _merge(next_frontier, c)

        frontier = next_frontier
        epoch += 1
        res.epochs_run += 1

    return res
