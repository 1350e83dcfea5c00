"""PII detection + redaction for web-text training corpora.

The reference pipeline stores raw note content verbatim
(/root/reference/crawler.py fetch/parse pass); a 100 TB web corpus destined
for LLM training additionally needs a PII scrub stage (emails, IPs, phone
numbers) before packing — the C4/Dolma-style rule set. Everything here is
pure JVM-side column expressions (regexp_extract_all + regexp_replace inside
whole-stage codegen, no Python in the hot path), embarrassingly parallel —
no shuffle, no skew surface, scales linearly with input splits.

Cross-engine regex rules (see CLAUDE.md): the patterns are shared VERBATIM
with the DuckDB oracle, so they contain NO backslash escapes — Spark SQL
string literals consume ``\\.`` (Hive escaping) while DuckDB keeps it.
Literal dots are written ``[.]``; digit classes are ``[0-9]`` not ``\\d``.
Both engines use leftmost-first greedy matching for these patterns (Java
regex / RE2 agree: no backtracking-sensitive constructs).

Redaction is a fixed cascade — emails, then IPv4, then phones — and each
class is COUNTED on the same intermediate its replace pass sees, so a
dotted quad inside an email host is an email (not also an IP), and an IP
already collapsed to ``<IP>`` can't be re-counted as a phone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: shared-verbatim patterns (no backslashes — see module docstring)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}([.][0-9]{1,3}){3}"
PHONE_RE = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _count_matches(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches — ``regexp_extract_all`` group 0 on
    both engines (Spark defaults to group 1 when the pattern has groups, so
    the index is explicit)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def pii_cols(text: Column) -> dict[str, Column]:
    """Per-document PII signals: span counts per class, total spans, and the
    redacted text (callers typically keep only its hash + length — the
    scrubbed corpus itself is the real sink output)."""
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IPV4_TOKEN)
    redacted = F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN)
    n_emails = _count_matches(text, EMAIL_RE)
    n_ipv4 = _count_matches(after_email, IPV4_RE)
    n_phones = _count_matches(after_ip, PHONE_RE)
    return {
        "n_emails": n_emails,
        "n_ipv4": n_ipv4,
        "n_phones": n_phones,
        "n_pii": (n_emails + n_ipv4 + n_phones).cast("long"),
        "redacted": redacted,
    }


def redact_col(text: Column) -> Column:
    """Just the scrubbed text (the sink-side projection of ``pii_cols``)."""
    return pii_cols(text)["redacted"]
