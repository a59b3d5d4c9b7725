"""WER / alignment / hallucination-metric tests (hand-computed goldens)."""

from distil_whisper_tpu.metrics import (
    wer, process_words, align_words, count_repeated_ngrams,
)


def test_perfect_match():
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0


def test_known_counts():
    # ref: a b c d   hyp: a x c  -> 1 substitution (b->x), 1 deletion (d)
    r = align_words("a b c d".split(), "a x c".split())
    assert (r.hits, r.substitutions, r.deletions, r.insertions) == (2, 1, 1, 0)
    assert r.wer == 2 / 4


def test_insertion():
    r = align_words("a b".split(), "a q b".split())
    assert (r.hits, r.insertions) == (2, 1)
    assert r.wer == 1 / 2


def test_corpus_accumulation():
    r = process_words(["a b", "c d"], ["a b", "c x"])
    assert r.num_ref_words == 4
    assert r.substitutions == 1
    assert r.wer == 1 / 4


def test_empty_hyp():
    r = align_words("a b c".split(), [])
    assert r.deletions == 3 and r.wer == 1.0


def test_matches_jiwer_convention():
    # classic jiwer example: wer("this is a test", "this is the test") = 0.25
    assert wer(["this is a test"], ["this is the test"]) == 0.25


def test_repeated_ngrams():
    text = " ".join(["a b c d e"] * 3)  # "a b c d e a b c d e a b c d e"
    # 5-gram "a b c d e" occurs 3 times -> 2 repeats; plus the rotations
    assert count_repeated_ngrams(text, 5) >= 2
    assert count_repeated_ngrams("a b c d e f g", 5) == 0
