"""Open-QA answer validation (DPR variant).

Reference semantics: utils/dpr_utils.py:232-340 — regex SimpleTokenizer over
NFD-normalized text; an answer "hits" a passage when its uncased token
sequence appears contiguously in the passage's token sequence. Used both for
coverage@k evaluation and for answer-filtered negative mining (reference
run_ann_data_gen_dpr.py:281-340).
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, Sequence

import regex as _regex

_ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
_NON_WS = r"[^\p{Z}\p{C}]"
_TOKEN_RE = _regex.compile(
    f"({_ALPHA_NUM})|({_NON_WS})",
    flags=_regex.IGNORECASE + _regex.UNICODE + _regex.MULTILINE)


def _normalize(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def tokenize_words(text: str, uncased: bool = True) -> list[str]:
    """SimpleTokenizer.tokenize(...).words(uncased=True) equivalent."""
    words = [m.group() for m in _TOKEN_RE.finditer(text)]
    return [w.lower() for w in words] if uncased else words


def has_answer(answers: Iterable[str], text: str | None) -> bool:
    """True iff any answer's token sequence occurs in the text."""
    if text is None:
        return False
    words = tokenize_words(_normalize(text))
    for answer in answers:
        ans = tokenize_words(_normalize(answer))
        if not ans:
            continue
        for i in range(0, len(words) - len(ans) + 1):
            if ans == words[i:i + len(ans)]:
                return True
    return False


def check_answer(passage_texts: Sequence[str | None],
                 answers: Iterable[str]) -> list[bool]:
    """Per-passage hit flags for one question's retrieved list
    (reference dpr_utils.py:232-238)."""
    return [has_answer(answers, t) for t in passage_texts]


def coverage_at_k(hit_lists: Sequence[Sequence[bool]],
                  ks: Sequence[int] = (20, 100)) -> dict[int, float]:
    """Fraction of questions with ≥1 answer-bearing passage in the top k
    (reference run_ann_data_gen_dpr.py:312-340 top-k hit curve)."""
    n = max(len(hit_lists), 1)
    out = {}
    for k in ks:
        out[k] = sum(1 for hits in hit_lists if any(hits[:k])) / n
    return out
