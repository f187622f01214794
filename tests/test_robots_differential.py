"""Differential test of the robots.txt parser against an independent model.

The robots_policy contract query checks parse_robots_policy against a DuckDB
oracle that MIRRORS the Spark expression tree — a shared misreading of the
group-selection / first-delay / trimming semantics would pass it. This model
is written imperatively from the documented semantics (RFC 9309 group
selection: consecutive User-agent lines head one group, agent-token groups
override ``*``, headerless files are one global group; first Crawl-delay
wins; values trimmed of spaces/tabs/CR; ``#`` comments stripped; empty rule
values dropped), so agreement is two independent derivations of the same
spec, not one derivation checked twice. 150 seeded-random bodies over mixed
case / CRLF / tabs / comments / junk directives, plus hand-picked group
shapes.
"""

import random
import re

from s_crawler_spark.operators import politeness as po

_WS = " \t\r"


def model_parse(body: str, agent_token: str = po.AGENT_TOKEN,
                default_delay_ms: int = po.DEFAULT_CRAWL_DELAY_MS):
    lines = []
    for raw in re.split(r"\r?\n", body):
        ln = re.sub(r"#.*", "", raw).strip(_WS)
        if ln:
            lines.append(ln)
    gid, prev_ua, tagged, has_ua = 0, False, [], False
    for ln in lines:
        is_ua = ln.lower().startswith("user-agent:")
        if is_ua:
            has_ua = True
            if not prev_ua:
                gid += 1
        tagged.append((gid, is_ua, ln))
        prev_ua = is_ua
    agent_gids = {g for g, is_ua, ln in tagged if is_ua
                  and ln[11:].strip(_WS).lower() == agent_token.lower()}
    star_gids = {g for g, is_ua, ln in tagged
                 if is_ua and ln[11:].strip(_WS) == "*"}
    if not has_ua:
        selected = tagged
    elif agent_gids:
        selected = [t for t in tagged if t[0] in agent_gids]
    elif star_gids:
        selected = [t for t in tagged if t[0] in star_gids]
    else:
        selected = []
    dis, allow, delay = [], [], None
    for _, _, ln in selected:
        low = ln.lower()
        m = re.match(r"(?i)^crawl-delay:[ \t]*([0-9]+)", ln)
        if m and delay is None:
            delay = int(m.group(1)) * 1000
        if low.startswith("disallow:"):
            v = ln[9:].strip(_WS)
            if v:
                dis.append(v)
        elif low.startswith("allow:"):
            v = ln[6:].strip(_WS)
            if v:
                allow.append(v)
    return {"crawl_delay_ms": delay if delay is not None else default_delay_ms,
            "robots_disallow": dis, "robots_allow": allow}


PATHS = ["/", "/a", "/a/b", "/cgi-bin/", "/tmp", "", "/x?y=1", "/%7Ej"]
AGENTS = ["*", "s-crawler-spark", "S-CRAWLER-SPARK", "googlebot",
          "Other-Bot", ""]


def _gen_body(rng):
    out = []
    for _ in range(rng.randrange(0, 14)):
        k = rng.randrange(10)
        eol = rng.choice(["\n", "\r\n"])
        if k < 3:
            out.append(f"User-{rng.choice(['agent', 'Agent', 'AGENT'])}:"
                       f"{rng.choice([' ', '', '  ', chr(9)])}"
                       f"{rng.choice(AGENTS)}{eol}")
        elif k < 6:
            out.append(f"{rng.choice(['Disallow', 'disallow', 'DISALLOW'])}:"
                       f"{rng.choice([' ', ''])}{rng.choice(PATHS)}"
                       f"{rng.choice(['', ' # trailing comment'])}{eol}")
        elif k < 7:
            out.append(f"Allow:{rng.choice([' ', ''])}{rng.choice(PATHS)}{eol}")
        elif k < 8:
            out.append(f"Crawl-{rng.choice(['delay', 'Delay'])}:"
                       f"{rng.choice([' ', '', chr(9)])}"
                       f"{rng.choice(['5', '10', '0', '2.5', '10abc', ''])}{eol}")
        elif k < 9:
            out.append(f"# full comment line{eol}")
        else:
            out.append(rng.choice([f"Sitemap: /s.xml{eol}", f"  {eol}",
                                   f"Host: e.com{eol}", f"garbage{eol}"]))
    return "".join(out)


def test_robots_parser_matches_independent_model(spark):
    rng = random.Random(20260821)
    bodies = [(f"h{i}.example.com", _gen_body(rng)) for i in range(150)]
    bodies += [
        ("edge1.com", ""),
        # preamble rules before any group header belong to gid 0 — selected
        # only in a headerless file, so here the * group's rule wins alone
        ("edge2.com", "Disallow: /a\nUser-agent: *\nDisallow: /b"),
        # adjacent UA lines share one group
        ("edge3.com", "User-agent: *\nUser-agent: s-crawler-spark\n"
                      "Disallow: /x"),
        # no matching group at all → no rules, default delay
        ("edge4.com", "User-agent: googlebot\nDisallow: /g"),
        # agent group OVERRIDES the * group (its delay, not the star's)
        ("edge5.com", "User-agent: s-crawler-spark\nCrawl-delay: 3\n"
                      "User-agent: *\nCrawl-delay: 9\nDisallow: /z"),
    ]
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    got = {r["host"]: r.asDict() for r in po.parse_robots_policy(df).collect()}
    for host, body in bodies:
        exp = model_parse(body)
        g = got[host]
        assert g["crawl_delay_ms"] == exp["crawl_delay_ms"], (host, body)
        assert list(g["robots_disallow"]) == exp["robots_disallow"], (host, body)
        assert list(g["robots_allow"]) == exp["robots_allow"], (host, body)
