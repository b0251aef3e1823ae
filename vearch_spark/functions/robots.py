"""robots.txt parsing and matching (RFC 9309, the Robots Exclusion
Protocol) — crawl COMPLIANCE for the ingestion side of the pipeline:
before a crawl-derived corpus is used, a curation pass checks which
fetched URLs the origin actually permitted, and a live crawler needs
the same decision per frontier URL. One robots.txt governs a whole
authority, so the distributed shape is: parse each domain's robots
once, broadcast-join the (much larger) URL relation on domain, and
evaluate the matcher as an Arrow-batched kernel — the rule sets ride
the closure, URLs never collect.

From-scratch to the RFC:

- line parse: ``field: value`` with ``#`` comments, unknown fields
  ignored, fields case-insensitive;
- group collection: consecutive ``user-agent`` lines share one group;
  rules before any user-agent line are ignored (RFC §2.2.1);
- group selection: the group whose user-agent token is the longest
  case-insensitive prefix-token match of the product token wins;
  ``*`` is the fallback; no match and no ``*`` → allow all;
- rule match: ``allow``/``disallow`` path patterns with ``*``
  (any-length wildcard) and ``$`` (end anchor), octet-wise;
- precedence: the MOST SPECIFIC match wins = longest pattern in
  octets; on a length tie, allow wins (RFC §2.2.2); no match →
  allowed; empty-pattern rules are ignored.

``crawl-delay`` (non-RFC but ubiquitous) and ``sitemap`` lines are
surfaced so pipelines can honor politeness and discovery.
"""

from __future__ import annotations

import re

import pandas as pd


def _pattern_to_regex(pattern: str) -> re.Pattern:
    out = []
    i = 0
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "$" and i == len(pattern) - 1:
            out.append("$")
        else:
            out.append(re.escape(ch))
        i += 1
    return re.compile("^" + "".join(out))


class RobotsRules:
    """One authority's parsed robots.txt."""

    __slots__ = ("groups", "sitemaps")

    def __init__(self, groups: list[dict], sitemaps: list[str]):
        self.groups = groups
        self.sitemaps = sitemaps

    def select_group(self, user_agent: str) -> dict | None:
        """RFC §2.2.1: the most specific matching user-agent token
        wins (longest case-insensitive prefix of the product token;
        '*' fallback), and ALL groups carrying that winning token
        combine their rules (the RFC's merge requirement)."""
        ua = user_agent.lower()
        best_token = None
        best_len = -1
        has_star = False
        for g in self.groups:
            for agent in g["agents"]:
                if agent == "*":
                    has_star = True
                elif ua.startswith(agent) and len(agent) > best_len:
                    best_token, best_len = agent, len(agent)
        token = best_token if best_token is not None else ("*" if has_star else None)
        if token is None:
            return None
        merged: dict = {"agents": [token], "rules": []}
        for g in self.groups:
            if token in g["agents"]:
                merged["rules"].extend(g["rules"])
                if "crawl_delay" in g and "crawl_delay" not in merged:
                    merged["crawl_delay"] = g["crawl_delay"]
        return merged

    def is_allowed(self, path: str, user_agent: str = "*") -> bool:
        """Most-specific (longest-pattern) rule wins; allow on ties;
        no matching rule → allowed."""
        g = self.select_group(user_agent)
        if g is None:
            return True
        best_len = -1
        best_allow = True
        for allow, pattern, rx in g["rules"]:
            if rx.match(path):
                ln = len(pattern)
                if ln > best_len or (ln == best_len and allow and not best_allow):
                    best_len, best_allow = ln, allow
        return best_allow

    def crawl_delay(self, user_agent: str = "*") -> float | None:
        g = self.select_group(user_agent)
        return g.get("crawl_delay") if g else None


def parse_robots(text: str) -> RobotsRules:
    """Parse robots.txt content. Never raises on malformed lines —
    the RFC demands crawlers be permissive; junk lines are skipped."""
    groups: list[dict] = []
    sitemaps: list[str] = []
    current: dict | None = None
    collecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            agent = value.lower()
            if collecting_agents and current is not None:
                current["agents"].append(agent)
            else:
                current = {"agents": [agent], "rules": []}
                groups.append(current)
                collecting_agents = True
            continue
        collecting_agents = False
        if field == "sitemap":
            sitemaps.append(value)
        elif current is None:
            continue  # rules before any user-agent line: ignored
        elif field in ("allow", "disallow"):
            if value:  # empty patterns are ignored (match nothing)
                current["rules"].append(
                    (field == "allow", value, _pattern_to_regex(value))
                )
        elif field == "crawl-delay":
            try:
                current["crawl_delay"] = float(value)
            except ValueError:
                pass
    return RobotsRules(groups, sitemaps)


_SITEMAP_URL_RE = re.compile(
    r"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.DOTALL | re.IGNORECASE
)
_SITEMAP_FIELD_RE = re.compile(
    r"<(loc|lastmod|changefreq|priority)\b[^>]*>\s*(.*?)\s*</\1>",
    re.DOTALL | re.IGNORECASE,
)
_XML_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'",
}


def parse_sitemap(text: str) -> dict:
    """Parse a sitemap.org XML document (urlset or sitemapindex) —
    the discovery companion of robots.txt. Tag-scoped regex
    extraction (the sitemap schema is flat — one level of <url>/
    <sitemap> entries with scalar children), entity-unescaped locs,
    no XML library needed. Returns ``{"kind": "urlset" |
    "sitemapindex", "entries": [{loc, lastmod, changefreq,
    priority}, ...]}``; typed ValueError when neither root element
    is present."""
    low = text.lower()
    if "<urlset" in low:
        kind = "urlset"
    elif "<sitemapindex" in low:
        kind = "sitemapindex"
    else:
        raise ValueError("not a sitemap: no urlset/sitemapindex root")
    entries = []
    for m in _SITEMAP_URL_RE.finditer(text):
        fields: dict = {
            "loc": None, "lastmod": None, "changefreq": None,
            "priority": None,
        }
        for fm in _SITEMAP_FIELD_RE.finditer(m.group(2)):
            val = fm.group(2)
            for ent, ch in _XML_ENTITIES.items():
                val = val.replace(ent, ch)
            key = fm.group(1).lower()
            fields[key] = float(val) if key == "priority" else val
        if fields["loc"] is not None:
            entries.append(fields)
    return {"kind": kind, "entries": entries}


def sitemap_xml(
    locs: list[str],
    lastmods: list[str] | None = None,
    index: bool = False,
) -> str:
    """Synthesize a spec-valid sitemap (or sitemapindex) for tests
    and oracles; locs are XML-escaped."""
    tag = "sitemap" if index else "url"
    root = "sitemapindex" if index else "urlset"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{root} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for i, loc in enumerate(locs):
        esc = (
            loc.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        out.append(f"  <{tag}>")
        out.append(f"    <loc>{esc}</loc>")
        if lastmods is not None and lastmods[i] is not None:
            out.append(f"    <lastmod>{lastmods[i]}</lastmod>")
        out.append(f"  </{tag}>")
    out.append(f"</{root}>")
    return "\n".join(out)


def robots_allowed_udf(user_agent: str = "*"):
    """Arrow-batched kernel ``(robots_text, path) -> allowed`` with a
    per-batch parse cache keyed on the robots text — in the
    domain-joined layout every batch holds few distinct robots, so
    the parse cost amortizes to once per (domain, batch)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("boolean")
    def allowed(robots: pd.Series, path: pd.Series) -> pd.Series:
        cache: dict[str, RobotsRules] = {}
        out = []
        for rb, p in zip(robots, path):
            if rb is None or p is None:
                out.append(True)  # no robots.txt -> allowed
                continue
            rules = cache.get(rb)
            if rules is None:
                rules = cache[rb] = parse_robots(rb)
            out.append(rules.is_allowed(p, user_agent))
        return pd.Series(out)

    return allowed
