"""robots.txt parsing: raw fetched robots bodies → the structured
``(host, crawl_delay, allow_prefixes, disallow_prefixes)`` table
:func:`frontier.apply_robots` broadcasts.

The reference trusts per-store hardcoded politeness (its stores are three
known hosts); a general frontier must parse what each host actually serves.
Implemented as an Arrow-batched pandas UDF (per-line string scanning does
not decompose into column expressions), following RFC 9309 semantics as the
major crawlers implement them:

- group selection: the ``User-agent:`` group matching ``agent`` exactly
  (case-insensitive) wins; else the ``*`` group; a group may list several
  user-agents before its rules
- ``Disallow:`` / ``Allow:`` path prefixes collected per group; an empty
  value matches nothing (``Disallow:`` alone = allow all)
- rule precedence (RFC 9309 §2.2.2): the LONGEST matching prefix wins
  between Allow and Disallow; on a tie, Allow wins — evaluated in
  :func:`frontier.apply_robots` as pure column expressions
- ``Crawl-delay:`` seconds (float) per group; None when absent
- comments (``# …``), blank lines tolerated; unknown directives are
  ignored but still terminate a group's user-agent preamble, so a
  following ``User-agent:`` line starts a NEW group rather than merging
  into the previous one (a common real-robots.txt shape: an Allow-only
  group followed by the ``*`` group); ``Sitemap:`` lines are extracted
  separately by :mod:`frontier_engine.sitemap` (global directive)
- ``*`` (any chars) and trailing ``$`` (end anchor) wildcards in rule
  paths are honored per RFC 9309 §2.2.3 (:func:`rule_matches_py` is the
  single semantic source, shared by the oracle crawler and property-
  tested against the Spark expression in ``frontier.apply_robots``);
  precedence for wildcard rules uses the rule's octet length, matching
  the reference implementations.  The match target is the URL's path
  INCLUDING the query string (§2.2.2)

Cited parity target: the reference's fixed per-host delays
(/root/reference/crawler/stores/*.py rate limiting) generalized to
crawler-standard parsing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARSED_SCHEMA = (
    "host string, crawl_delay double, "
    "allow_prefixes array<string>, disallow_prefixes array<string>"
)


def rule_matches_py(rule: str, path: str) -> bool:
    """RFC 9309 §2.2.3 rule matching: plain rules are path prefixes; ``*``
    matches any character run; a TRAILING ``$`` anchors the rule to the
    path end (``$`` elsewhere is literal).  ``path`` is the URL path
    including any query string."""
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    import re as _re

    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pattern = "^" + ".*".join(_re.escape(part) for part in body.split("*"))
    if anchored:
        pattern += "$"
    return _re.search(pattern, path) is not None


def parse_robots_txt(
    body: str, agent: str = "*"
) -> tuple[float | None, list[str], list[str]]:
    """Pure-Python single-document parser (shared by the UDF and tests).

    Returns ``(crawl_delay, allow_prefixes, disallow_prefixes)``.
    """
    if body is None:
        return None, [], []
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_allow: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_allow, cur_dis, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_allow, cur_dis, cur_delay))
        cur_agents, cur_allow, cur_dis, cur_delay, in_rules = [], [], [], None, False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val:
                cur_dis.append(val)
        elif key == "allow":
            in_rules = True
            if val:
                cur_allow.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        else:
            # unknown directive (Sitemap/...) — ignored, but it ends the
            # group's user-agent preamble so the next User-agent line
            # starts a fresh group instead of merging into this one
            in_rules = bool(cur_agents)
    flush()

    agent_l = agent.lower()
    for agents, allow, dis, delay in groups:  # exact-agent group wins
        if agent_l in agents:
            return delay, allow, dis
    for agents, allow, dis, delay in groups:  # else the wildcard group
        if "*" in agents:
            return delay, allow, dis
    return None, [], []


def parse_robots(
    df: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
    default_crawl_delay: float = 1.0,
) -> DataFrame:
    """(host, body) → (host, crawl_delay, allow_prefixes, disallow_prefixes).

    Hosts whose robots.txt sets no Crawl-delay get ``default_crawl_delay``.
    One Arrow batch per invocation; the parser is pure per-row Python on a
    string column inside ``mapInPandas`` — robots documents are small and
    one-per-host, so this stage is a rounding error next to the crawl.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parsed = [parse_robots_txt(b, agent) for b in pdf[body_col]]
            yield pd.DataFrame(
                {
                    "host": pdf[host_col],
                    "crawl_delay": [
                        float(d) if d is not None else float(default_crawl_delay)
                        for d, _, _ in parsed
                    ],
                    "allow_prefixes": [allow for _, allow, _ in parsed],
                    "disallow_prefixes": [dis for _, _, dis in parsed],
                }
            )

    return df.select(host_col, body_col).mapInPandas(run, schema=PARSED_SCHEMA)


def robots_table(
    df: DataFrame,
    agent: str = "*",
    default_crawl_delay: float = 1.0,
    ts_col: str | None = None,
) -> DataFrame:
    """Dedup to one row per host, then parse.

    When a fetch timestamp is available (``ts_col``, or a ``fetched_ts``
    column present in ``df``), the NEWEST body wins — a host whose
    robots.txt changed between fetches must be governed by the latest
    policy, not a lexicographic accident (ties broken by smallest body for
    determinism).  Without a timestamp there is no order to trust, so the
    lexicographically smallest body per host keeps the table stable across
    input orderings (last-wins-by-arrival is partition-order-dependent).
    """
    if ts_col is None and "fetched_ts" in df.columns:
        ts_col = "fetched_ts"
    if ts_col is not None:
        from .ops import last_wins

        one = last_wins(
            df.select("host", "body", ts_col),
            ["host"],
            [F.col(ts_col).desc(), F.col("body").asc()],
        ).select("host", "body")
    else:
        one = df.groupBy("host").agg(F.min("body").alias("body"))
    return parse_robots(one, agent, default_crawl_delay=default_crawl_delay)
