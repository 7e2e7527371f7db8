"""PII redaction for crawl text — the Dolma/RedPajama-style curation
mask pass (emails, phone numbers, IPv4 addresses → typed placeholder
tokens) every released web corpus runs before training.

Same engine-parity contract as url.py's canonicalizer: every pattern is
a plain regex — no lookarounds AND no zero-width assertions (``\\b`` is
a parity trap: Python ``re`` classifies word chars by Unicode while
RE2 is ASCII-only, so a digit next to 'é' is a boundary in one engine
and not the other) — applied as an ordered chain. The SQL twin replays
the chain verbatim with RE2 ``regexp_replace(..., 'g')`` /
``regexp_extract_all``, so an oracle value-hash match proves both regex
engines masked every row identically. Both engines use leftmost-first
match semantics, so greedy ``{1,3}`` groups count and slice the same.

A production ruleset would add word-boundary guards around the IPv4
rule (here a 5-digit run can shed digits into a match — deterministic
and identical on both engines, but linguistically sloppy); that guard
is exactly the ``\\b`` parity trap above, so this module trades a
little over-masking for a provable oracle.

Step order is part of the contract: counts for step k are taken on the
text AFTER steps 1..k-1 have already replaced (an email's host can
otherwise double-count into the IPv4 rule)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

# (kind, pattern, replacement) — applied in order; shared verbatim with
# the SQL twin (queries.py SQL_REDACT_PII).
PII_STEPS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+",
     "<EMAIL>"),
    ("phone",
     r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
     "<PHONE>"),
    ("ipv4",
     r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
     "<IP>"),
]


def redact_pii_series(texts: pd.Series,
                      steps=PII_STEPS) -> tuple[pd.Series, pd.DataFrame]:
    """(redacted_texts, counts) — counts has one int64 ``n_<kind>``
    column per step, taken on the chain's intermediate text (see module
    contract). Vectorized: pandas .str.count / .str.replace C paths,
    compiled-regex reuse across both calls, no per-row Python."""
    counts = {}
    t = texts
    for kind, pat, repl in steps:
        counts[f"n_{kind}"] = t.str.count(pat).astype("int64")
        t = t.str.replace(pat, repl, regex=True)
    return t, pd.DataFrame(counts)


def redact_pii(ds: ray.data.Dataset, text_col: str = "text",
               steps=PII_STEPS) -> ray.data.Dataset:
    """Map stage: replace ``text_col`` with its redacted form and append
    one ``n_<kind>`` count column per rule. Pure map-side — no exchange,
    streams at any scale."""

    def f(batch: pa.Table) -> pa.Table:
        red, counts = redact_pii_series(batch[text_col].to_pandas(), steps)
        cols = {}
        for c in batch.column_names:
            cols[c] = (pa.array(red.to_numpy(dtype=object),
                                type=pa.string())
                       if c == text_col else batch[c])
        for c in counts.columns:
            cols[c] = pa.array(counts[c].to_numpy(), type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")
