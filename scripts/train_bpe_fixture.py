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

import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pretokens(text: str) -> list[str]:
    """Split before every space; drop the possibly-empty head."""
    return [s for s in re.split(r"(?= )", text) if s]


def wrap_hex(pre: str) -> str:
    hx = pre.encode("utf-8").hex().upper()
    return "".join(f"({hx[i:i + 2]})" for i in range(0, len(hx), 2))


def train(texts, n_merges: int):
    """Delegates the merge loop to the ONE shared trainer definition
    (torua_spark.functions.bpe.train_from_counts) so the committed
    fixture, this generator, and the engine's distributed bpe_train
    cannot drift. History note (r11 review): the loop previously
    lived here with a tie-break that diverged from the documented
    lexicographically-smaller-(P, Q) rule on proper-prefix ties;
    regenerating under the documented rule swapped ranks 43/44 of
    the v1 fixture — two TIED rules, (' c','olumn') and
    (' ','order'), which share no token and so can never compete
    for an adjacency: every input's segmentation is identical under
    either order."""
    from torua_spark.functions.bpe import train_from_counts

    words = Counter()
    for t in texts:
        for p in pretokens(t or ""):
            words[wrap_hex(p)] += 1
    return train_from_counts(words, n_merges)


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
