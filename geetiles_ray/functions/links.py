"""Hyperlink extraction from raw html — the outlink half of a web graph.

The reference's per-tile downloads have no link notion; this is part of the
LLM-data-pipeline extension family (like pagerank_docs, which consumes a
host graph this operator can produce). Two halves:

- a deterministic link *synthesis* rule (pure function of doc_id) used by the
  fixtures so the DuckDB oracle can replay the expected edge set closed-form
  without parsing html — the same trick as the sha256-geocode
  (pipelines/queries.py _GEO_CTE);
- the *extraction* operator: compiled-regex href scan over the ``html``
  binary column → one output row per edge. Stateless map (regex compiled at
  module import, once per worker process), so it streams at any corpus size;
  the per-row findall is unavoidable (variable edge count per page) but each
  row's work is a single C-regex pass, same discipline as
  sources/pages.extract_text.

Synthesized anchors carry EMPTY anchor text (``<a href="..."></a>``) so the
byte-identical ``text``-per-``url`` extraction invariant (north rule) is
preserved: tags strip to spaces and whitespace-normalize away.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..sources.pages import html_of_text

N_DST_HOSTS = 97
_LINKS_MOD = 4  # n_links(doc) = doc_id % 4


def link_targets(doc_id: int) -> list[str]:
    """The synthesis rule: page ``doc_id`` links to
    ``https://dst{(doc_id*31 + j*17 + 7) % 97}.example/{doc_id}-{j}``
    for j in [0, doc_id % 4). SQL replay:
    ``UNNEST(range(doc_id % 4))`` + the same affine host id."""
    return [
        f"https://dst{(doc_id * 31 + j * 17 + 7) % N_DST_HOSTS}.example/"
        f"{doc_id}-{j}"
        for j in range(doc_id % _LINKS_MOD)
    ]


def html_with_links(text: str, doc_id: int) -> bytes:
    """Crawl-shaped html for ``text`` with the deterministic outlinks
    appended as empty anchors just before </body> — extraction of the
    visible text is unchanged (anchors have no anchor text)."""
    base = html_of_text(text)
    anchors = "".join(f'<a href="{u}"></a>' for u in link_targets(doc_id))
    tail = b"</body></html>"
    assert base.endswith(tail)
    return base[:-len(tail)] + anchors.encode("ascii") + tail


_HREF_RE = re.compile(rb'<a\s[^>]*?href="([^"]*)"')
_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/@]*@)?([^/:?#]+)")


def href_hosts(html: bytes) -> list[str]:
    """All link-target hosts of one page, document order; userinfo@ and
    :port are stripped (same authority discipline as functions/url.py)."""
    out = []
    for href in _HREF_RE.findall(html):
        m = _HOST_RE.match(href.decode("utf-8", errors="replace"))
        if m:
            out.append(m.group(2))
    return out


def extract_links_batch(batch: pa.Table, html_col: str = "html",
                        src_col: str = "doc_id") -> pa.Table:
    """pages(src, html) → edges(src, dst_host): one row per hyperlink.
    Pages with no links produce no rows (flat-map shape via map_batches —
    output row count is independent of input row count)."""
    htmls = batch[html_col].to_pylist()
    per_row = [href_hosts(h) for h in htmls]
    counts = np.fromiter((len(p) for p in per_row), dtype=np.int64,
                         count=len(per_row))
    src = np.repeat(batch[src_col].to_numpy(zero_copy_only=False), counts)
    dst = [h for hosts in per_row for h in hosts]
    return pa.table({
        src_col: pa.array(src, type=batch.schema.field(src_col).type),
        "dst_host": pa.array(dst, type=pa.string()),
    })
