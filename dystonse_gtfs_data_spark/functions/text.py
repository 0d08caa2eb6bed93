"""Text-analysis column expressions for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All JVM-side built-ins (regexp/split/length) — no Python in the hot path.
Each function has a DuckDB-SQL twin generated from the same constants so
the correctness oracle cannot drift from the engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language-ID stopword packs (tiny n-gram/stopword heuristic)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "for", "on", "a"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "von"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "de", "que", "los", "un", "una", "es", "por", "con"],
}

PUNCT_PATTERN = r"[.,;:!?]"
BPE_ISH_TOKEN_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def ws_token_count_sql(text: str) -> str:
    return f"len(string_split_regex(trim({text}), '\\s+'))"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token count: lowercase runs / capitalized runs / digit runs /
    single punctuation, approximating subword tokenizer output size."""
    return F.regexp_count(text, F.lit(BPE_ISH_TOKEN_PATTERN))


def bpe_ish_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{BPE_ISH_TOKEN_PATTERN}'))"


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_PATTERN)) / F.greatest(
        F.length(text), F.lit(1)
    )


def punct_ratio_sql(text: str) -> str:
    return (
        f"len(regexp_extract_all({text}, '{PUNCT_PATTERN}')) * 1.0"
        f" / greatest(length({text}), 1)"
    )


def mean_word_len(text: Column) -> Column:
    toks = ws_token_count(text)
    return F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / F.greatest(
        toks, F.lit(1)
    )


def mean_word_len_sql(text: str) -> str:
    return (
        f"length(regexp_replace(trim({text}), '\\s+', '', 'g')) * 1.0"
        f" / greatest({ws_token_count_sql(text)}, 1)"
    )


def _stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def stopword_hits(text: Column, lang: str) -> Column:
    return F.regexp_count(F.lower(text), F.lit(_stopword_pattern(lang)))


def stopword_hits_sql(text: str, lang: str) -> str:
    return f"len(regexp_extract_all(lower({text}), '{_stopword_pattern(lang)}'))"


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_hits(text, lang) / F.greatest(ws_token_count(text), F.lit(1))


def stopword_ratio_sql(text: str, lang: str = "en") -> str:
    return (
        f"{stopword_hits_sql(text, lang)} * 1.0"
        f" / greatest({ws_token_count_sql(text)}, 1)"
    )


def lang_id(text: Column) -> Column:
    """Pick the language whose stopword pack hits most (ties → lexicographic
    first via the greatest-of-structs trick, deterministic on both engines)."""
    expr: Column | None = None
    best_score: Column | None = None
    # evaluate langs in sorted order; strictly-greater keeps the earliest max
    for lang in sorted(LANG_STOPWORDS):
        score = stopword_hits(text, lang)
        if expr is None:
            expr, best_score = F.lit(lang), score
        else:
            expr = F.when(score > best_score, F.lit(lang)).otherwise(expr)
            best_score = F.greatest(score, best_score)
    return expr


def lang_id_sql(text: str) -> str:
    langs = sorted(LANG_STOPWORDS)
    expr = f"'{langs[0]}'"
    best = stopword_hits_sql(text, langs[0])
    for lang in langs[1:]:
        score = stopword_hits_sql(text, lang)
        expr = f"(CASE WHEN {score} > {best} THEN '{lang}' ELSE {expr} END)"
        best = f"greatest({score}, {best})"
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: lowercase, strip non-alphanumerics, collapse
    whitespace — near-dup key for normalization-level duplicates."""
    t = F.lower(F.trim(text))
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    return F.regexp_replace(t, r"\s+", " ")


def fingerprint_sql(text: str) -> str:
    return (
        f"regexp_replace(regexp_replace(lower(trim({text})), "
        f"'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')"
    )


def format_delay(delay_s: Column) -> Column:
    """C16: signed delay rendering '+N'/'-N' (format_delay,
    src/monitor/mod.rs:1174-1181)."""
    from pyspark.sql import functions as F  # local alias for clarity

    return F.format_string("%+d", delay_s.cast("int"))


def format_delay_sql(delay_s: str) -> str:
    return f"printf('%+d', CAST({delay_s} AS INT))"


def format_duration(seconds: Column) -> Column:
    """C16: duration rendering — minutes when >= 60 s, else seconds
    (format_duration, src/monitor/mod.rs:1183-1190)."""
    from pyspark.sql import functions as F

    s = seconds.cast("int")
    return (
        F.when(s >= 60, F.format_string("%d min", (s / 60).cast("int")))
        .otherwise(F.format_string("%d s", s))
    )


def format_duration_sql(seconds: str) -> str:
    s = f"CAST({seconds} AS INT)"
    return (
        f"(CASE WHEN {s} >= 60 THEN printf('%d min', CAST(floor({s} / 60) AS INT)) "
        f"ELSE printf('%d s', {s}) END)"
    )


# C17: GTFS route_type → display label (src/monitor/mod.rs:894-922)
ROUTE_TYPE_LABELS: list[tuple[int, str]] = [
    (0, "Tram"),
    (1, "U-Bahn"),
    (2, "Zug"),
    (3, "Bus"),
    (4, "Faehre"),
    (5, "Standseilbahn"),
    (6, "Seilbahn"),
    (7, "Zahnradbahn"),
]


def route_type_label(route_type: Column) -> Column:
    from pyspark.sql import functions as F

    expr = None
    for code, label in ROUTE_TYPE_LABELS:
        cond = route_type == code
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise("Unbekannt")


def route_type_label_sql(route_type: str) -> str:
    whens = " ".join(
        f"WHEN {code} THEN '{label}'" for code, label in ROUTE_TYPE_LABELS
    )
    return f"(CASE {route_type} {whens} ELSE 'Unbekannt' END)"


# C6: duration-string parsing (the reference parses its `--interval` CLI
# arg with the parse_duration crate, src/analyser/count.rs:30-37).  Grammar
# accepted here: whitespace-or-concatenated terms `<int><unit>` with unit in
# {w, d, h, min, m, s, ms, us}; a bare integer means seconds (the crate's
# default).  Result is total MICROSECONDS as BIGINT (integer-exact on both
# engines); NULL when no term matches.
_DURATION_TERM_RE = r"\d+\s*[a-z]*"
_DURATION_UNIT_US: list[tuple[str, int]] = [
    ("w", 7 * 86400 * 1_000_000),
    ("d", 86400 * 1_000_000),
    ("h", 3600 * 1_000_000),
    ("min", 60 * 1_000_000),
    ("m", 60 * 1_000_000),
    ("s", 1_000_000),
    ("ms", 1_000),
    ("us", 1),
    ("", 1_000_000),  # bare number -> seconds
]


def parse_duration_us(text: Column) -> Column:
    """Total microseconds for a parse_duration-style string ('1h 30min',
    '90m', '2d4h', '300') — pure JVM higher-order functions, no Python."""
    terms = F.regexp_extract_all(F.lower(text), F.lit(_DURATION_TERM_RE), 0)

    def term_us(t: Column) -> Column:
        n = F.regexp_extract(t, r"(\d+)", 1).cast("long")
        u = F.regexp_extract(t, r"([a-z]+)", 1)
        mult = None
        for unit, us in _DURATION_UNIT_US:
            cond = u == unit
            mult = F.when(cond, us) if mult is None else mult.when(cond, us)
        return n * mult.otherwise(F.lit(None).cast("long"))

    total = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, t: acc + term_us(t)
    )
    return F.when(F.size(terms) > 0, total)


def parse_duration_us_sql(text: str) -> str:
    cases = " ".join(
        f"WHEN '{unit}' THEN {us}" for unit, us in _DURATION_UNIT_US
    )
    term = (
        "CAST(regexp_extract(t, '(\\d+)', 1) AS BIGINT) * "
        f"(CASE regexp_extract(t, '([a-z]+)', 1) {cases} "
        "ELSE CAST(NULL AS BIGINT) END)"
    )
    terms = f"regexp_extract_all(lower({text}), '{_DURATION_TERM_RE}')"
    # outer CAST: DuckDB's list_sum widens to HUGEINT, which pandas renders
    # as float64 and breaks the driver's exact value hash vs Spark's BIGINT
    return (
        f"(CASE WHEN len({terms}) > 0 THEN "
        f"CAST(list_sum(list_transform({terms}, t -> {term})) AS BIGINT) END)"
    )


# C8: percent-encoding of URL path elements (PATH_ELEMENT_ESCAPE =
# CONTROLS + '/' + '?' + '\"' + '`', src/monitor/mod.rs:25-27; applied via
# utf8_percent_encode at src/monitor/mod.rs:1214-1262).  Per the
# percent-encoding crate's contract, non-ASCII bytes are ALWAYS escaped and
# the AsciiSet only governs ASCII bytes.  Implemented byte-wise over the
# UTF-8 hex expansion so the whole thing stays in JVM expressions:
# a hex pair is escaped iff its first digit is 0/1 (C0 controls) or >= 8
# (non-ASCII byte), or it is exactly 7F (DEL control) / 2F '/' / 3F '?' /
# 22 '\"' / 60 '`'.
_ESCAPE_FIRST_DIGITS = ("0", "1", "8", "9", "A", "B", "C", "D", "E", "F")
_ESCAPE_EXACT_PAIRS = ("7F", "2F", "3F", "22", "60")


def percent_encode_path(text: Column) -> Column:
    pairs = F.regexp_extract_all(F.hex(F.encode(text, "UTF-8")), F.lit(".."), 0)

    def enc(p: Column) -> Column:
        first = F.substring(p, 1, 1)
        escape = first.isin(*_ESCAPE_FIRST_DIGITS) | p.isin(
            *_ESCAPE_EXACT_PAIRS
        )
        return F.when(escape, F.concat(F.lit("%"), p)).otherwise(
            F.decode(F.unhex(p), "UTF-8")
        )

    return F.array_join(F.transform(pairs, enc), "")


def percent_encode_path_sql(text: str) -> str:
    firsts = ", ".join(f"'{d}'" for d in _ESCAPE_FIRST_DIGITS)
    exacts = ", ".join(f"'{p}'" for p in _ESCAPE_EXACT_PAIRS)
    enc = (
        f"CASE WHEN substr(p, 1, 1) IN ({firsts}) OR p IN ({exacts}) "
        "THEN '%' || p ELSE decode(from_hex(p)) END"
    )
    pairs = f"regexp_extract_all(hex(encode({text})), '..')"
    return f"array_to_string(list_transform({pairs}, p -> {enc}), '')"


def percent_decode_path(enc: Column) -> Column:
    """Inverse of :func:`percent_encode_path` (percent_decode_str,
    src/monitor/mod.rs:1229-1247): every ``%XX`` becomes its byte.  Rather
    than decoding bytes one at a time (which would shred multi-byte UTF-8
    sequences through per-byte `decode`), the whole string is rebuilt as one
    hex expansion and un-hexed in a single step."""
    parts = F.split(enc, "%")
    head = F.hex(F.encode(F.element_at(parts, 1), "UTF-8"))
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def seg(e: Column) -> Column:
        # a '%' NOT followed by two hex digits passes through verbatim —
        # percent_decode_str's contract for invalid sequences
        valid = e.rlike("^[0-9a-fA-F]{2}")
        return F.when(
            valid,
            F.concat(
                F.upper(F.substring(e, 1, 2)),
                F.hex(F.encode(F.substring(e, 3, 1_000_000_000), "UTF-8")),
            ),
        ).otherwise(F.hex(F.encode(F.concat(F.lit("%"), e), "UTF-8")))

    hexs = F.transform(tail, seg)
    return F.decode(F.unhex(F.concat(head, F.array_join(hexs, ""))), "UTF-8")


def percent_decode_path_sql(enc: str) -> str:
    parts = f"string_split({enc}, '%')"
    head = f"hex(encode(({parts})[1]))"
    tail = f"list_slice({parts}, 2, len({parts}))"
    seg = (
        "CASE WHEN regexp_matches(e, '^[0-9a-fA-F]{2}') "
        "THEN upper(substr(e, 1, 2)) || hex(encode(substr(e, 3, 1000000000))) "
        "ELSE hex(encode('%' || e)) END"
    )
    hexs = f"list_transform({tail}, e -> {seg})"
    return f"decode(from_hex({head} || array_to_string({hexs}, '')))"


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing)
# ---------------------------------------------------------------------------
#
# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b, \d,
# non-capturing groups.  No backreferences or lookaround.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{2}-\d{3}-\d{3}-\d{4}\b"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# redaction is ordered: emails first (their local parts can contain digit
# runs that would otherwise be mangled by the phone/IP passes), then the
# dash-separated phone grammar, then dotted quads
_PII_REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_PATTERN, "<EMAIL>"),
    (PHONE_PATTERN, "<PHONE>"),
    (IPV4_PATTERN, "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        "email_count": F.regexp_count(text, F.lit(EMAIL_PATTERN)),
        "phone_count": F.regexp_count(text, F.lit(PHONE_PATTERN)),
        "ipv4_count": F.regexp_count(text, F.lit(IPV4_PATTERN)),
    }


def pii_counts_sql(text: str) -> dict[str, str]:
    return {
        "email_count": f"len(regexp_extract_all({text}, '{EMAIL_PATTERN}'))",
        "phone_count": f"len(regexp_extract_all({text}, '{PHONE_PATTERN}'))",
        "ipv4_count": f"len(regexp_extract_all({text}, '{IPV4_PATTERN}'))",
    }


def redact_pii(text: Column) -> Column:
    out = text
    for pat, repl in _PII_REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(text: str) -> str:
    out = text
    for pat, repl in _PII_REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


# ---------------------------------------------------------------------------
# URL extraction (boilerplate/domain analysis)
# ---------------------------------------------------------------------------
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._/%+-]*)?"
_DOMAIN_OF = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), 0)


def extract_urls_sql(text: str) -> str:
    return f"regexp_extract_all({text}, '{URL_PATTERN}')"


def url_domain(url: Column) -> Column:
    return F.regexp_extract(url, _DOMAIN_OF, 1)


def url_domain_sql(url: str) -> str:
    return f"regexp_extract({url}, '{_DOMAIN_OF}', 1)"


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards moderate word length,
    presence of stopwords, low punctuation density (heuristics in the
    spirit of C4/Gopher quality rules)."""
    mwl = mean_word_len(text)
    sw = stopword_ratio(text, "en")
    pr = punct_ratio(text)
    score = (
        F.when((mwl >= 3) & (mwl <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(sw * 2.0, F.lit(0.4))
        + F.when(pr < 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return score


def quality_score_sql(text: str) -> str:
    mwl = mean_word_len_sql(text)
    sw = stopword_ratio_sql(text, "en")
    pr = punct_ratio_sql(text)
    return (
        f"((CASE WHEN {mwl} >= 3 AND {mwl} <= 10 THEN 0.4 ELSE 0.0 END)"
        f" + least({sw} * 2.0, 0.4)"
        f" + (CASE WHEN {pr} < 0.1 THEN 0.2 ELSE 0.0 END))"
    )


# Monitor trip-descriptor grammar (src/monitor/journey_data.rs:393-397):
# "<route_type_label> <route_name> nach <trip_headsign> um <HH:MM>".
# Greedy (.+) groups, so a headsign containing " nach " binds to the
# LAST separator — Java, RE2, and Rust regex agree on greediness.
TRIP_DESCRIPTOR_RE = r"^(\S+) (.+) nach (.+) um (\d\d:\d\d)$"


def format_trip_descriptor(
    route_type: Column, route_name: Column, headsign: Column, dep_sec: Column
) -> Column:
    """Build the monitor's trip URL element from its parts; departure
    time rendered HH:MM from seconds-of-day (mod 24 h — GTFS >24:00:00
    trips display their wall-clock time, as the reference's %H:%M
    format does)."""
    from pyspark.sql import functions as F

    # explicit floor: Spark's double->int cast truncates while DuckDB's
    # rounds — floor() agrees everywhere
    hh = F.lpad((F.floor(dep_sec / 3600) % 24).cast("string"), 2, "0")
    mm = F.lpad(F.floor((dep_sec % 3600) / 60).cast("string"), 2, "0")
    return F.concat_ws(
        " ",
        route_type_label(route_type),
        route_name,
        F.lit("nach"),
        headsign,
        F.lit("um"),
        F.concat(hh, F.lit(":"), mm),
    )


def format_trip_descriptor_sql(
    route_type: str, route_name: str, headsign: str, dep_sec: str
) -> str:
    hh = f"lpad(CAST((CAST(floor(({dep_sec}) / 3600) AS BIGINT) % 24) AS VARCHAR), 2, '0')"
    mm = f"lpad(CAST(CAST(floor((({dep_sec}) % 3600) / 60) AS BIGINT) AS VARCHAR), 2, '0')"
    return (
        f"({route_type_label_sql(route_type)} || ' ' || {route_name} || "
        f"' nach ' || {headsign} || ' um ' || {hh} || ':' || {mm})"
    )


def parse_trip_descriptor(desc: Column) -> Column:
    """Inverse of :func:`format_trip_descriptor`: struct(route_type_label,
    route_name, trip_headsign, departure_hhmm); fields are empty strings
    when the descriptor does not match the grammar (regexp_extract's
    no-match convention, mirrored by the SQL twin)."""
    from pyspark.sql import functions as F

    return F.struct(
        F.regexp_extract(desc, TRIP_DESCRIPTOR_RE, 1).alias("route_type_label"),
        F.regexp_extract(desc, TRIP_DESCRIPTOR_RE, 2).alias("route_name"),
        F.regexp_extract(desc, TRIP_DESCRIPTOR_RE, 3).alias("trip_headsign"),
        F.regexp_extract(desc, TRIP_DESCRIPTOR_RE, 4).alias("departure_hhmm"),
    )


def parse_trip_descriptor_sql(desc: str) -> dict[str, str]:
    """DuckDB twin — one expression per parsed field (coalesce matches
    Spark's empty-string no-match convention)."""
    return {
        name: f"coalesce(regexp_extract({desc}, '{TRIP_DESCRIPTOR_RE}', {i}), '')"
        for i, name in enumerate(
            ("route_type_label", "route_name", "trip_headsign", "departure_hhmm"),
            start=1,
        )
    }
