"""URL parsing + per-domain stats (functions/url.py)."""

import pandas as pd
import ray.data

from geetiles_ray.functions import url as urlmod


class TestParseUrls:
    def test_components(self):
        s = pd.Series([
            "https://en.site3.example/p/42?ref=r1",
            "http://bare.example/",
            "https://deep.a.b.site.example/x/y#frag",
            "ftp://files.example",          # no path at all
            "not a url",                     # unparseable → empty strings
            "https://single/x",              # dotless host → no domain
        ])
        p = urlmod.parse_urls(s)
        assert list(p.scheme) == ["https", "http", "https", "ftp", "", "https"]
        assert list(p.host) == ["en.site3.example", "bare.example",
                                "deep.a.b.site.example", "files.example",
                                "", "single"]
        assert list(p.domain) == ["site3.example", "bare.example",
                                  "site.example", "files.example", "", ""]
        assert list(p.path) == ["/p/42", "/", "/x/y", "", "", "/x"]

    def test_port_and_userinfo_stripped(self):
        s = pd.Series([
            "https://example.com:8080/x",
            "https://user@host.example/y",
            "https://u:pw@en.site.example:443/z",
            "http://bad.example:/trailing-colon",
        ])
        p = urlmod.parse_urls(s)
        assert list(p.host) == ["example.com", "host.example",
                                "en.site.example", "bad.example"]
        assert list(p.domain) == ["example.com", "host.example",
                                  "site.example", "bad.example"]

    def test_add_url_columns_stage(self):
        df = pd.DataFrame({"url": ["https://a.b.example/p", "x"],
                           "v": [1, 2]})
        out = urlmod.add_url_columns(ray.data.from_pandas(df)) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        assert list(out.columns) == ["url", "v", "scheme", "host",
                                     "domain", "path"]
        assert out.domain[0] == "b.example" and out.domain[1] == ""

    def test_domain_stats_brute(self):
        rows = []
        for i in range(60):
            lang = ["en", "es", "fr"][i % 3]
            rows.append({"url": f"https://{lang}.site{i % 4}.example/p/{i}",
                         "lang": lang, "n_chars": 10 + i})
        df = pd.DataFrame(rows)
        got = urlmod.domain_stats(ray.data.from_pandas(df))
        exp = df.copy()
        exp["domain"] = "site" + (df.index % 4).astype(str) + ".example"
        exp["host"] = df.lang + "." + exp.domain
        b = exp.groupby("domain").agg(
            n_pages=("url", "size"), n_hosts=("host", "nunique"),
            n_langs=("lang", "nunique"), sum_chars=("n_chars", "sum"),
        ).reset_index().sort_values("domain").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, b.astype({
            "n_pages": "int64", "n_hosts": "int64",
            "n_langs": "int64", "sum_chars": "int64"}))
