"""PII redaction: chain parity vs brute re.sub, count-on-intermediate
contract, and the distributed stage's schema/passthrough behavior."""

import re

import pandas as pd
import pyarrow as pa
import ray.data

from geetiles_ray.functions import pii


def brute(texts, steps=pii.PII_STEPS):
    rows = []
    for t in texts:
        counts = []
        for _, pat, repl in steps:
            counts.append(len(re.findall(pat, t)))
            t = re.sub(pat, repl, t)
        rows.append((t, *counts))
    return rows


CASES = [
    "mail me at jo.hn+spam@sub.host.example thanks",
    "two a@b.example and c_d%e@f-g.example here",
    "call +1-555-123-4567 or +44-207-946-0958 now",
    "server at 10.0.255.3 and 192.168.1.1, port none",
    "overlong 12345.6.7.89012 digit run",
    "email-then-host x@1.2.3.four",
    "no pii at all",
    "",
    "unicode près de 9.9.9.9 é@h.example",
]


class TestRedactPii:
    def test_series_matches_brute(self):
        red, counts = pii.redact_pii_series(pd.Series(CASES))
        want = brute(CASES)
        for i, (t, ne, np_, ni) in enumerate(want):
            assert red.iloc[i] == t, CASES[i]
            assert counts.n_email.iloc[i] == ne
            assert counts.n_phone.iloc[i] == np_
            assert counts.n_ipv4.iloc[i] == ni

    def test_counts_taken_on_intermediate_text(self):
        # the email host would match the ipv4 rule if counted on the RAW
        # text; the contract counts AFTER the email mask has replaced it
        t = pd.Series(["u@1.2.3.example x 1.2.3.4"])
        red, counts = pii.redact_pii_series(t)
        assert counts.n_email[0] == 1
        assert counts.n_ipv4[0] == 1  # only the standalone IP survives
        assert red[0] == "<EMAIL> x <IP>"

    def test_stage_passthrough_and_schema(self):
        df = pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "fr"],
                           "text": [CASES[0], CASES[3]]})
        out = pii.redact_pii(ray.data.from_pandas(df)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out.columns) == ["doc_id", "lang", "text",
                                     "n_email", "n_phone", "n_ipv4"]
        assert out.lang.tolist() == ["en", "fr"]
        assert "<EMAIL>" in out.text[0] and "<IP>" in out.text[1]
        assert out.n_email.tolist() == [1, 0]
        assert out.n_ipv4.tolist() == [0, 2]

    def test_duckdb_re2_chain_parity(self):
        # the oracle gate proves this on real tables; pin the raw-chain
        # parity on the adversarial cases here too
        import duckdb
        con = duckdb.connect()
        t = pd.Series(CASES)
        for _, pat, repl in pii.PII_STEPS:
            got = [con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g'), "
                "len(regexp_extract_all(?, ?))",
                [s, pat, repl, s, pat]).fetchone() for s in t]
            want_red = t.str.replace(pat, repl, regex=True)
            want_cnt = t.str.count(pat)
            for i, (r, c) in enumerate(got):
                assert r == want_red.iloc[i], (pat, t.iloc[i])
                assert c == want_cnt.iloc[i], (pat, t.iloc[i])
            t = want_red
