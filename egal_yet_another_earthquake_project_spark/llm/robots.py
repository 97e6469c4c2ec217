"""robots.txt politeness gate — the crawl front end's admission rule.

Reference anchor: none — north-star mandate (the reference ingests a
REST feed; a crawl that fetches the open web must honor RFC 9309
before a byte of HTML enters the pipeline).

Two stages, both scale-shaped:

* :func:`robots_rules` — parse each domain's ``robots.txt`` payload
  into rule rows ``(domain, pattern, allow, plen, rx)``. Arrow-batched
  ``mapInPandas`` (a text parser is Python work, like the WARC walk);
  one output row per rule of the SELECTED group — RFC 9309 group
  choice: the group whose ``User-agent`` token is the most specific
  match for the crawler's agent (longest matching token; ``*`` = 0),
  agent-specific groups SHADOW the ``*`` group entirely. Patterns keep
  their spec semantics: prefix match with ``*`` wildcards and an
  optional ``$`` end anchor, translated once per rule into an anchored
  regex (``rx``); ``plen`` is the pattern's octet length — the RFC's
  precedence key.

* :func:`robots_allowed` — decide every URL with native expressions:
  parse scheme://host/path by ``regexp_extract`` (codegen'd), join the
  (tiny — rules per domain, not per page) rule frame on the domain,
  keep matching rules via JVM ``rlike``, and take the winning rule per
  URL by the RFC order: longest pattern wins, ``Allow`` wins ties.
  URLs with no matching rule (or no rules at all) are allowed — the
  RFC default. The join broadcasts the rule side; the URL frame is
  never shuffled, so the gate costs one broadcast join at any crawl
  size.

The ``robots_gate`` declared query hash-verifies the WHOLE stack
against a hand-derived truth table over fixed rule sets (wildcards,
``$`` anchors, Allow-overrides-Disallow, agent-specific shadowing,
empty file) — the oracle never re-implements the parser, it asserts
the decisions.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pattern_rx(pattern: str) -> str:
    """RFC 9309 path pattern → anchored Java/RE2-safe regex: literal
    chars escaped, ``*`` → ``.*``, a trailing ``$`` anchors the end
    (anywhere else ``$`` is literal per the spec)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + ("$" if anchored else "")


def parse_robots(text: str, agent: str) -> list[tuple[str, bool, int, str]]:
    """One domain's robots.txt → the SELECTED group's rules as
    ``(pattern, allow, plen, rx)``. Pure function (unit-testable
    without Spark); malformed lines are skipped, never raised — a
    crawl must not die on a webmaster's typo."""
    agent_l = agent.lower()
    groups: list[tuple[int, list[tuple[str, bool]]]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_group_rules = False

    def flush() -> None:
        nonlocal cur_uas, cur_rules, in_group_rules
        if cur_uas:
            spec = -1
            for ua in cur_uas:
                if ua == "*":
                    spec = max(spec, 0)
                elif ua.lower() in agent_l:
                    spec = max(spec, len(ua))
            if spec >= 0:
                groups.append((spec, list(cur_rules)))
        cur_uas, cur_rules, in_group_rules = [], [], False

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_rules:
                flush()
            cur_uas.append(val)
        elif key in ("allow", "disallow"):
            in_group_rules = True
            if cur_uas and val:
                cur_rules.append((val, key == "allow"))
            # empty Disallow: means allow-all — contributes no rule
    flush()
    if not groups:
        return []
    best = max(g[0] for g in groups)
    rules: list[tuple[str, bool, int, str]] = []
    for spec, rs in groups:
        if spec == best:
            for pattern, allow in rs:
                rules.append((pattern, allow, len(pattern), _pattern_rx(pattern)))
    return rules


def robots_rules(
    robots: DataFrame,
    agent: str,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, robots_txt) → one row per selected-group rule:
    ``(domain, pattern, allow, plen, rx)``. Arrow-batched map lane."""
    import pandas as pd

    d_in, t_in = domain_col, text_col

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            doms, pats, allows, plens, rxs = [], [], [], [], []
            for dom, text in zip(pdf[d_in], pdf[t_in]):
                for pattern, allow, plen, rx in parse_robots(
                    "" if text is None else str(text), agent
                ):
                    doms.append(dom)
                    pats.append(pattern)
                    allows.append(allow)
                    plens.append(plen)
                    rxs.append(rx)
            yield pd.DataFrame(
                {
                    "domain": doms,
                    "pattern": pats,
                    "allow": allows,
                    "plen": plens,
                    "rx": rxs,
                }
            )

    return robots.select(d_in, t_in).mapInPandas(
        run, "domain string, pattern string, allow boolean, plen int, rx string"
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """``urls`` + an ``allowed`` boolean per RFC 9309 precedence.
    Native expressions end to end: domain/path extraction is
    ``regexp_extract``, rule matching is JVM ``rlike``, the winner is
    one aggregation over the (URL × matching-rule) frame — which the
    broadcast join keeps at candidate scale (rules per domain are a
    handful; the URL side never shuffles)."""
    parsed = urls.withColumn(
        "_dom",
        F.lower(F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)),
    ).withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    matched = (
        parsed.join(
            F.broadcast(rules.withColumnRenamed("domain", "_dom")),
            "_dom",
            "left",
        )
        .withColumn(
            "_hit",
            F.col("rx").isNotNull()
            & F.rlike(F.col("_path"), F.col("rx")),
        )
        .groupBy(*[F.col(c) for c in urls.columns])
        .agg(
            # RFC order: longest pattern first, Allow beats Disallow on
            # ties — encode as max of (plen, allow) pairs and read the
            # winner's allow bit; no matching rule → allow
            F.max(
                F.when(
                    F.col("_hit"),
                    F.struct(
                        F.col("plen"),
                        F.col("allow").cast("int").alias("_a"),
                    ),
                )
            ).alias("_win")
        )
        .withColumn(
            "allowed",
            F.when(F.col("_win").isNull(), F.lit(True)).otherwise(
                F.col("_win")["_a"] == 1
            ),
        )
        .drop("_win")
    )
    return matched
