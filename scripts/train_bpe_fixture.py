"""Train the frozen byte-pair-encoding merge fixture (run once; the
output is committed — the engine never trains at query time).

Byte-level BPE in the GPT-2 style (Sennrich et al. 2016 "Neural
Machine Translation of Rare Words with Subword Units"; Radford et al.
2019 GPT-2 released the byte-level variant): start from the 256 byte
vocabulary, repeatedly fuse the most frequent adjacent token pair, and
record the fusion order. Encoding later replays the SAME fusions in
rank order, so the merge table fully determines the tokenizer.

Conventions pinned here and mirrored bit-for-bit by the engine
(torua_spark/functions/bpe.py) and the DuckDB oracle:

- PRE-TOKENIZATION: the text splits into pre-tokens at a boundary
  BEFORE every space byte (0x20) — each space attaches to the word it
  precedes, the GPT-2 " word" shape. Merges never cross a boundary.
  (The reference convention "split before every 0x20" is chosen over
  GPT-2's full contraction regex because it is expressible as ONE
  literal string operation in any engine — no regex-dialect drift.)
- TOKEN REPRESENTATION: a token is its UPPERCASE hex byte string; a
  token sequence is rendered "(48)(49)" with pre-token boundaries as
  "|". Fusing pair (P, Q) is then literally
  replace("(P)(Q)" -> "(PQ)") — the same leftmost non-overlapping
  semantics in Python str.replace, Spark replace(), and DuckDB
  replace(), which is what makes the unrolled oracle exact.
- DETERMINISM: ties on pair frequency break on the lexicographically
  smaller (P, Q); no RNG anywhere.

Usage: python scripts/train_bpe_fixture.py [sf_dir] [n_merges]
Writes torua_spark/resources/bpe_merges_v1.py

The committed v1 table uses n_merges=96: this corpus's vocabulary is
tiny enough that BPE SATURATES at 127 merges (every word one token,
BPE count == whitespace count — a degenerate tokenizer that would
make the oracle check vacuous). 96 keeps genuine subword
segmentation: corpus-wide BPE/whitespace token ratio 1.39, the
25-40% divergence band real GPT-2-style tokenizers show, so budgets
denominated in these tokens are measurably different from
split-on-space.
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

TOKEN_RE = re.compile(r"\(([0-9A-F]+)\)")


def pretokens(text: str) -> list[str]:
    """Split before every space; drop the possibly-empty head."""
    return [s for s in re.split(r"(?= )", text) if s]


def wrap_hex(pre: str) -> str:
    hx = pre.encode("utf-8").hex().upper()
    return "".join(f"({hx[i:i + 2]})" for i in range(0, len(hx), 2))


def train(texts, n_merges: int):
    words = Counter()
    for t in texts:
        for p in pretokens(t or ""):
            words[wrap_hex(p)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in words.items():
            toks = TOKEN_RE.findall(w)
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        # fuse only pairs that actually repeat (freq 1 fusions would
        # just memorize the corpus tail)
        candidates = [(pair, c) for pair, c in pairs.items() if c >= 2]
        if not candidates:
            break
        # ties on frequency break on the lexicographically smaller
        # (P, Q) TUPLE, exactly as the module docstring pins (the r11
        # review caught the previous negated-ordinal trick breaking
        # ties on the JOINED string and preferring the longer one on
        # proper-prefix ties). Regenerating under the documented rule
        # swapped ranks 43/44 of the v1 fixture — two TIED rules,
        # (' c','olumn') and (' ','order'), which share no token and
        # so can never compete for an adjacency: every input's
        # segmentation is identical under either order, and the
        # committed fixture was updated to this rule's output so
        # trainer, docs, and fixture agree.
        (p, q), _ = min(candidates, key=lambda pc: (-pc[1], pc[0]))
        merges.append((p, q))
        pat, rep = f"({p})({q})", f"({p}{q})"
        nxt: Counter = Counter()
        for w, c in words.items():
            nxt[w.replace(pat, rep)] += c
        words = nxt
    return merges


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
            f"ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train(texts, n_merges)
    out = Path(__file__).resolve().parents[1] / "torua_spark" / "resources"
    out.mkdir(exist_ok=True)
    (out / "__init__.py").touch()
    body = "\n".join(f'    ("{p}", "{q}"),' for p, q in merges)
    (out / "bpe_merges_v1.py").write_text(
        '"""FROZEN byte-level BPE merge table v1 — generated once by\n'
        "scripts/train_bpe_fixture.py over /root/testdata/sf0.001\n"
        "documents (deterministic: frequency-then-lexicographic merge\n"
        "selection, no RNG) and committed. Tokens are UPPERCASE hex\n"
        "byte strings; rank = list position. Do not regenerate without\n"
        "bumping the version: every persisted token count denominated\n"
        'in these merges would silently change meaning."""\n\n'
        f"N_MERGES = {len(merges)}\n\n"
        "MERGES = [\n" + body + "\n]\n"
    )
    print(f"wrote {len(merges)} merges to {out / 'bpe_merges_v1.py'}")


if __name__ == "__main__":
    main()
