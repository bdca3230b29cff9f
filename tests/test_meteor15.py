"""METEOR-1.5 scorer: hand-computed pins of the scoring model
(alpha=.85, beta=.2, gamma=.6, delta=.75; content/function weighting;
corpus-level aggregation of sufficient statistics — the reference's Java
METEOR semantics, /root/reference/dmi/utils/eval_utils.py:195-198)."""

import math

import pytest

from dmi_tpu.evals import meteor15 as m15
from dmi_tpu.evals.meteor15 import (
    Meteor15Config,
    meteor15_corpus,
    score_from_stats,
    segment_stats,
)

CFG = Meteor15Config()  # exact+stem only (no synonym/paraphrase data)


def seg_score(hyp, ref, cfg=CFG):
    return score_from_stats(segment_stats(hyp, ref, cfg), cfg)


def test_identical_content_sentence():
    # 3 content words, exact matches, one chunk spanning everything:
    # P = R = 1, F = 1, frag = 1/3, pen = .6*(1/3)^.2
    s = seg_score(["red", "cars", "race"], ["red", "cars", "race"])
    pen = 0.6 * (1 / 3) ** 0.2
    assert s == pytest.approx(1.0 * (1 - pen), abs=1e-12)


def test_content_function_weighting():
    # hyp=[the cat] ref=[the dog]: only 'the' (function word) matches.
    # wm = 1.0*(1-delta) = .25 ; wlen = .25+.75 = 1.0 -> P = R = .25
    # F = .25; m=1, chunks=1, frag=1, pen=.6 -> score = .25*.4 = .1
    s = seg_score(["the", "cat"], ["the", "dog"])
    assert s == pytest.approx(0.1, abs=1e-12)


def test_stem_stage_weight():
    # running~runs match only at the stem stage (w=0.6):
    # P = R = .6*.75/.75 = .6 ; F = .6 ; pen = .6 -> score .24
    s = seg_score(["running"], ["runs"])
    assert s == pytest.approx(0.24, abs=1e-12)


def test_chunk_counting_on_swap():
    # hyp=[a b c d] vs ref=[a b d c] (all content): 4 exact matches in 3
    # chunks -> frag = 3/4, pen = .6*.75^.2, F = 1
    s = seg_score(list("abcd"), ["a", "b", "d", "c"])
    assert s == pytest.approx(1 - 0.6 * 0.75**0.2, abs=1e-12)


def test_no_match_scores_zero():
    assert seg_score(["cat"], ["dog"]) == 0.0
    assert seg_score([], ["dog"]) == 0.0


def test_alignment_prefers_chunk_extension():
    # 'a' appears twice in ref; greedy must pick the one that continues the
    # chunk started by 'x': hyp=[x a] ref=[a x a] -> matches (0,1),(1,2)
    matches = m15.align(["x", "a"], ["a", "x", "a"], CFG)
    assert [(h, r) for h, _, r, _, _ in matches] == [(0, 1), (1, 2)]
    assert m15._count_chunks(matches) == 1


def test_corpus_aggregation_is_not_mean_of_segments():
    cands = [["red", "cars"], ["dog"]]
    refs = [[["red", "cars"]], [["cat"]]]
    corpus, segs, meta = meteor15_corpus(cands, refs)
    # segment scores: perfect pair and a zero
    pen1 = 0.6 * (1 / 2) ** 0.2
    assert segs[0] == pytest.approx(1 - pen1, abs=1e-12)
    assert segs[1] == 0.0
    # corpus: summed stats -> P = R = 1.5/2.25 (unmatched 'dog'/'cat'
    # dilute), F = P, frag = 1/2, same pen
    p = (2 * 0.75) / (3 * 0.75)
    f = p * p / (0.85 * p + 0.15 * p)
    expect = f * (1 - 0.6 * (1 / 2) ** 0.2)
    assert corpus == pytest.approx(expect, abs=1e-12)
    assert corpus != pytest.approx(sum(segs) / 2, abs=1e-6)
    assert meta["meteor_stages"] == ["exact", "stem"]


def test_best_reference_selected():
    cands = [["red", "cars"]]
    refs = [[["dog"], ["red", "cars"]]]
    _, segs, _ = meteor15_corpus(cands, refs)
    assert segs[0] == pytest.approx(1 - 0.6 * 0.5**0.2, abs=1e-12)


def test_synonym_stage_pluggable():
    syn = lambda w: {"cat": frozenset({"feline"})}.get(w, frozenset())
    cfg = Meteor15Config(synonyms=syn)
    # synonym stage weight .8: P = R = .8 -> F = .8, pen = .6 -> .32
    assert seg_score(["feline"], ["cat"], cfg) == pytest.approx(0.32, abs=1e-12)
    assert cfg.active_stages() == ["exact", "stem", "synonym"]


def test_paraphrase_stage_pluggable():
    table = {("at", "once"): {("immediately",)}}
    cfg = Meteor15Config(paraphrases=table)
    # hyp=[leave at once] ref=[leave immediately]:
    # exact 'leave' (content .75) + paraphrase span (.6 weight)
    # wm_h = .75 + .6*(.25+.25) = 1.05 ; wlen_h = 1.25 -> P = .84
    # wm_r = .75 + .6*.75 = 1.2 ; wlen_r = 1.5 -> R = .8
    # one contiguous chunk; m_h=3, m_r=2 -> frag = 1/2.5
    p, r = 1.05 / 1.25, 1.2 / 1.5
    f = p * r / (0.85 * p + 0.15 * r)
    expect = f * (1 - 0.6 * (1 / 2.5) ** 0.2)
    s = seg_score(["leave", "at", "once"], ["leave", "immediately"], cfg)
    assert s == pytest.approx(expect, abs=1e-12)


def test_lowercasing_at_corpus_entry():
    corpus, _, _ = meteor15_corpus([["Red"]], [[["red"]]])
    assert corpus > 0


def test_coco_eval_uses_meteor15(tmp_path):
    """coco_caption_eval's METEOR field is the corpus METEOR-1.5 value."""
    import json

    from dmi_tpu.evals.coco_eval import coco_caption_eval
    from dmi_tpu.evals.tokenize import ptb_tokenize

    ann = {
        "annotations": [
            {"image_id": 1, "caption": "a red car on the road"},
            {"image_id": 2, "caption": "two dogs play in the park"},
        ]
    }
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(ann))
    preds = [
        {"image_id": 1, "caption": "a red car on a road"},
        {"image_id": 2, "caption": "dogs playing in a park"},
    ]
    out = coco_caption_eval(str(path), preds)
    cands = [ptb_tokenize(p["caption"]) for p in preds]
    refs = [
        [ptb_tokenize("a red car on the road")],
        [ptb_tokenize("two dogs play in the park")],
    ]
    expect, _, _ = meteor15_corpus(cands, refs)
    assert out["METEOR"] == pytest.approx(expect, abs=1e-12)


# ---------------------------------------------------------------------------
# Optimal-alignment property test (VERDICT r2 #5): the DP resolver achieves
# the brute-force-optimal (coverage DESC, chunks ASC, start-distance ASC)
# objective on randomized inputs with repeated words, stems, synonyms and
# multi-word paraphrases.
# ---------------------------------------------------------------------------

def _objective(matches):
    cov = sum(hl + rl for _, hl, _, rl, _ in matches)
    dist = sum(abs(h0 - r0) for h0, _, r0, _, _ in matches)
    return (cov, -m15._count_chunks(sorted(matches)), -dist)


def _brute_force_best(cands):
    """Lexicographic-best feasible subset by exhaustive enumeration."""
    best = (0, 0, 0)

    def feasible(sel, m):
        h0, hl, r0, rl, _ = m
        for a0, al, b0, bl, _ in sel:
            if h0 < a0 + al and a0 < h0 + hl:
                return False
            if r0 < b0 + bl and b0 < r0 + rl:
                return False
        return True

    def rec(idx, sel):
        nonlocal best
        obj = _objective(sel)
        if obj > best:
            best = obj
        for k in range(idx, len(cands)):
            if feasible(sel, cands[k]):
                sel.append(cands[k])
                rec(k + 1, sel)
                sel.pop()

    rec(0, [])
    return best


def test_align_matches_brute_force_on_random_inputs():
    import random

    rng = random.Random(1234)
    vocab = ["cat", "cats", "dog", "run", "running", "fast", "the", "a"]
    syn = {"fast": frozenset({"quick"}), "quick": frozenset({"fast"})}
    cfg = Meteor15Config(
        synonyms=lambda w: syn.get(w, frozenset()),
        paraphrases={("the", "cat"): {("a", "cat"), ("kitty",)},
                     ("a", "cat"): {("the", "cat")},
                     ("kitty",): {("the", "cat")}},
    )
    for trial in range(60):
        h = [rng.choice(vocab + ["kitty", "quick"]) for _ in range(rng.randint(1, 7))]
        r = [rng.choice(vocab + ["kitty", "quick"]) for _ in range(rng.randint(1, 7))]
        cands = m15.candidate_matches(h, r, cfg)
        if len(cands) > 18:  # keep brute force tractable
            continue
        got = m15.align(h, r, cfg)
        assert _objective(got) == _brute_force_best(cands), (h, r, got)


def test_align_prefers_fewer_chunks_over_distance():
    # hyp: [x y] ref: [y x x y] — matching (x->2, y->3) is one chunk
    # (contiguous both sides, dist 4); (x->1, y->0) has dist 2 but 2 chunks:
    # the chunk criterion outranks start distance.
    got = m15.align(["x", "y"], ["y", "x", "x", "y"], CFG)
    assert _objective(got)[1] == -1, got
    assert [(m[0], m[2]) for m in got] == [(0, 2), (1, 3)]


def test_default_config_paraphrase_env_drop(tmp_path, monkeypatch):
    """The BASELINE.md data-drop procedure: DMI_METEOR_PARAPHRASES points
    at a TSV and default_config activates the paraphrase stage."""
    from dmi_tpu.evals.meteor15 import default_config

    tsv = tmp_path / "paraphrase-en.tsv"
    tsv.write_text("depart\tleave\nbig dog\tlarge hound\n")
    monkeypatch.setenv("DMI_METEOR_PARAPHRASES", str(tsv))
    cfg = default_config()
    assert "paraphrase" in cfg.active_stages()
    assert ("depart",) in cfg.paraphrases
    monkeypatch.delenv("DMI_METEOR_PARAPHRASES")
    assert "paraphrase" not in default_config().active_stages()
