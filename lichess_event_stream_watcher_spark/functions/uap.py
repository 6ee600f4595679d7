"""From-scratch user-agent parser driven by the PUBLIC ua-parser
``regexes.yaml`` format (uap-core) — the same move as ``mmdb.py``: the
container lacks the ``ua_parser`` package, so rather than silently
degrading the reference's generic parse path (d) to a handful of
hard-coded fast regexes, implement the public FORMAT and ALGORITHM
directly (reference behavior: src/event.rs:148-167 formats the parsed
client/os as ``family + " " + major`` and rewrites device "Other" ->
"Computer").

uap-core matching semantics (public spec, docs.md of the uap-core repo):

- three rule lists: ``user_agent_parsers``, ``os_parsers``,
  ``device_parsers``; within a list the FIRST rule whose regex SEARCHES
  (not full-matches) the UA string wins;
- replacements: ``family_replacement`` / ``os_replacement`` /
  ``device_replacement`` override the default (capture group 1), with
  ``$1``..``$9`` substituted by capture groups (missing group -> empty,
  result whitespace-trimmed); ``v1_replacement`` / ``os_v1_replacement``
  override the default major version (capture group 2);
- ``regex_flag: 'i'`` marks a case-insensitive device rule;
- no rule hit -> family "Other" (and None major).

The RULESET here is original and deliberately minimal (common engines,
OSes, and devices) — it is data, not code: drop a full uap-core
``regexes.yaml`` next to it and ``UAParser.from_yaml`` runs the real
thing unchanged. Rules load through PyYAML when importable, else through
``_parse_simple_yaml`` (a subset reader sufficient for the format:
top-level keys of lists of flat scalar maps).
"""

from __future__ import annotations

import re
from functools import lru_cache

_GROUP_RE = re.compile(r"\$(\d)")

BUILTIN_RULES_YAML = r"""
user_agent_parsers:
  # openers/renames first: first match wins, so branded Chromium shells
  # must precede the bare Chrome token they also carry
  - regex: '(OPR)/(\d+)'
    family_replacement: 'Opera'
  - regex: '(Opera)[ /](\d+)'
  - regex: '(Edg|Edge|EdgA|EdgiOS)/(\d+)'
    family_replacement: 'Edge'
  - regex: '(SamsungBrowser)/(\d+)'
    family_replacement: 'Samsung Internet'
  - regex: '(YaBrowser)/(\d+)'
    family_replacement: 'Yandex Browser'
  - regex: '(Vivaldi)/(\d+)'
  - regex: '(DuckDuckGo)/(\d+)'
  - regex: '(FxiOS)/(\d+)'
    family_replacement: 'Firefox iOS'
  - regex: '(Firefox)/(\d+)'
  - regex: '(CriOS)/(\d+)'
    family_replacement: 'Chrome Mobile iOS'
  - regex: '(HeadlessChrome)/(\d+)'
  - regex: '(Chromium)/(\d+)'
  - regex: '(Chrome)/(\d+)[\d.]* Mobile'
    family_replacement: 'Chrome Mobile'
  - regex: '(Chrome)/(\d+)'
  # Safari reports its version in a separate token, so the family comes
  # from a replacement and the major from $1
  - regex: 'Version/(\d+)[\d.]* Mobile[^(]*Safari'
    family_replacement: 'Mobile Safari'
    v1_replacement: '$1'
  - regex: 'Version/(\d+)[^(]*Safari'
    family_replacement: 'Safari'
    v1_replacement: '$1'
  - regex: '(MSIE) (\d+)'
    family_replacement: 'IE'
  - regex: 'Trident/.*rv:(\d+)'
    family_replacement: 'IE'
    v1_replacement: '$1'
  - regex: '(Googlebot)/(\d+)'
  - regex: '(bingbot)/(\d+)'
  - regex: '([A-Za-z0-9]+[Bb]ot)/(\d+)'
  - regex: '(curl)/(\d+)'
  - regex: '(Wget)/(\d+)'
    family_replacement: 'wget'
  - regex: '(python-requests)/(\d+)'
    family_replacement: 'Python Requests'
  - regex: '(okhttp)/(\d+)'
  - regex: '(PostmanRuntime)/(\d+)'
  - regex: '(Electron)/(\d+)'
  - regex: '(Java)/(\d+)'
os_parsers:
  # exact NT build names before the generic NT fallback
  - regex: 'Windows NT 10\.0'
    os_replacement: 'Windows'
    os_v1_replacement: '10'
  - regex: 'Windows NT 6\.3'
    os_replacement: 'Windows'
    os_v1_replacement: '8'
  - regex: 'Windows NT 6\.2'
    os_replacement: 'Windows'
    os_v1_replacement: '8'
  - regex: 'Windows NT 6\.1'
    os_replacement: 'Windows'
    os_v1_replacement: '7'
  - regex: 'Windows NT 6\.0'
    os_replacement: 'Windows Vista'
  - regex: 'Windows NT 5\.1'
    os_replacement: 'Windows XP'
  - regex: 'Windows Phone (?:OS )?(\d+)'
    os_replacement: 'Windows Phone'
    os_v1_replacement: '$1'
  - regex: '(Windows NT) (\d+)'
    os_replacement: 'Windows'
  - regex: 'iPhone OS (\d+)'
    os_replacement: 'iOS'
    os_v1_replacement: '$1'
  - regex: 'CPU OS (\d+)'
    os_replacement: 'iOS'
    os_v1_replacement: '$1'
  - regex: 'Mac OS X (\d+)'
    os_replacement: 'Mac OS X'
    os_v1_replacement: '$1'
  - regex: '(Android) (\d+)'
  - regex: 'CrOS [^ ]+ (\d+)'
    os_replacement: 'Chrome OS'
    os_v1_replacement: '$1'
  - regex: '(Ubuntu)'
  - regex: '(FreeBSD)'
  - regex: '(Linux)'
device_parsers:
  - regex: 'bot|crawl|spider'
    regex_flag: 'i'
    device_replacement: 'Spider'
  - regex: '\((iPhone|iPad|iPod)[;)]'
  - regex: '(iPhone|iPad|iPod)'
  - regex: '[(; ](SM-[A-Za-z0-9]+)[^)]*\)'
    device_replacement: 'Samsung $1'
  - regex: '\((Pixel[^;)]*)[;)]'
  - regex: 'Android [^;]+; ([^;)/]+) Build'
  - regex: '\(PlayStation (\d+)'
    device_replacement: 'PlayStation $1'
  - regex: '(Kindle)'
"""


def _parse_simple_yaml(text: str) -> dict[str, list[dict[str, str]]]:
    """Subset YAML reader for the regexes.yaml shape: top-level keys, list
    items of flat ``key: 'scalar'`` maps, ``#`` comments. Enough to load
    both the builtin ruleset and uap-core's published file (whose entries
    are exactly this shape); PyYAML is preferred when importable."""
    out: dict[str, list[dict[str, str]]] = {}
    section: list[dict[str, str]] | None = None
    item: dict[str, str] | None = None

    def scalar(raw: str) -> str:
        raw = raw.strip()
        if raw and raw[0] in "'\"" and raw.endswith(raw[0]) and len(raw) >= 2:
            body = raw[1:-1]
            # single-quoted YAML escapes '' -> '
            return body.replace("''", "'") if raw[0] == "'" else body
        return raw

    for line in text.splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        if not line[0].isspace():  # top-level section
            key = line.split(":", 1)[0].strip()
            section = out.setdefault(key, [])
            item = None
            continue
        stripped = line.strip()
        if section is None:
            raise ValueError(f"list item before any section: {line!r}")
        if stripped.startswith("- "):
            item = {}
            section.append(item)
            stripped = stripped[2:]
        if item is None:
            raise ValueError(f"mapping line outside a list item: {line!r}")
        k, _, v = stripped.partition(":")
        item[k.strip()] = scalar(v)
    return out


def load_rules(text: str) -> dict[str, list[dict[str, str]]]:
    try:
        import yaml

        return yaml.safe_load(text)
    except ImportError:
        return _parse_simple_yaml(text)


def _substitute(template: str, m: re.Match) -> str:
    def repl(g: re.Match) -> str:
        i = int(g.group(1))
        try:
            return m.group(i) or ""
        except (IndexError, re.error):
            return ""

    return _GROUP_RE.sub(repl, template).strip()


def _group(m: re.Match, i: int) -> str | None:
    try:
        return m.group(i)
    except IndexError:
        return None


class UAParser:
    """Compiled ruleset with uap-core first-match-wins semantics.

    ``parse`` returns (ua_family, ua_major, os_family, os_major,
    device_family) with uap-core defaults ("Other"/None) — the
    DeviceInfo formatting (reference src/event.rs:148-167) lives in
    ``device_info`` so this class stays a faithful format engine.
    """

    def __init__(self, rules: dict[str, list[dict[str, str]]]) -> None:
        def compiled(section: str):
            out = []
            for rule in rules.get(section) or []:
                flags = re.IGNORECASE if rule.get("regex_flag") == "i" else 0
                out.append((re.compile(rule["regex"], flags), rule))
            return out

        self._ua = compiled("user_agent_parsers")
        self._os = compiled("os_parsers")
        self._dev = compiled("device_parsers")

    @classmethod
    def builtin(cls) -> "UAParser":
        return cls(load_rules(BUILTIN_RULES_YAML))

    @classmethod
    def from_yaml(cls, path: str) -> "UAParser":
        with open(path, encoding="utf-8") as f:
            return cls(load_rules(f.read()))

    def parse(
        self, ua: str
    ) -> tuple[str, str | None, str, str | None, str]:
        ua_family, ua_major = "Other", None
        for rx, rule in self._ua:
            m = rx.search(ua)
            if not m:
                continue
            fam = rule.get("family_replacement")
            ua_family = _substitute(fam, m) if fam else (_group(m, 1) or "Other")
            v1 = rule.get("v1_replacement")
            ua_major = _substitute(v1, m) if v1 else _group(m, 2)
            break
        os_family, os_major = "Other", None
        for rx, rule in self._os:
            m = rx.search(ua)
            if not m:
                continue
            fam = rule.get("os_replacement")
            os_family = _substitute(fam, m) if fam else (_group(m, 1) or "Other")
            v1 = rule.get("os_v1_replacement")
            os_major = _substitute(v1, m) if v1 else _group(m, 2)
            break
        device = "Other"
        for rx, rule in self._dev:
            m = rx.search(ua)
            if not m:
                continue
            rep = rule.get("device_replacement")
            device = _substitute(rep, m) if rep else (_group(m, 1) or "Other")
            break
        return ua_family, ua_major or None, os_family, os_major or None, device


@lru_cache(maxsize=1)
def builtin_parser() -> UAParser:
    """Process-wide singleton (compiled once per executor)."""
    return UAParser.builtin()


def device_info(ua: str, parser: UAParser | None = None) -> tuple[str, str, str]:
    """(device, os, client) with the reference's DeviceInfo formatting
    (src/event.rs:148-167): device "Other" -> "Computer"; os and client
    are ``family + " " + major`` when a major version parsed, bare family
    otherwise."""
    p = parser or builtin_parser()
    ua_family, ua_major, os_family, os_major, device = p.parse(ua or "")
    return (
        "Computer" if device == "Other" else device,
        f"{os_family} {os_major}" if os_major else os_family,
        f"{ua_family} {ua_major}" if ua_major else ua_family,
    )
