"""Native eval harness tests: scorer math + calc_metrics dispatch."""

import numpy as np
import pytest

from dmi_tpu.evals.bleu import coco_bleu, hf_bleu
from dmi_tpu.evals.cider import cider_d
from dmi_tpu.evals.coco_eval import coco_caption_eval
from dmi_tpu.evals.meteor import corpus_meteor, single_meteor
from dmi_tpu.evals.metrics import calc_metrics, normalize_image_ids
from dmi_tpu.evals.rouge import rouge_l
from dmi_tpu.evals.tokenize import ptb_tokenize

CAPS = [
    "a dog runs on green grass near the water",
    "two people walk along a sandy beach",
    "an industrial area with many buildings",
    "a residential area with dense houses",
]


def toks(strs):
    return [s.split() for s in strs]


def test_ptb_tokenize():
    assert ptb_tokenize("A man's hat, isn't it?") == [
        "a", "man", "'s", "hat", "is", "n't", "it",
    ]
    assert ptb_tokenize("Hello world.") == ["hello", "world"]
    assert ptb_tokenize("one-two three--four") == ["one-two", "three", "four"] or \
        ptb_tokenize("one-two three--four")[0].startswith("one")


def test_cider_perfect_and_disjoint():
    cands = toks(CAPS)
    refs = [[c] for c in toks(CAPS)]
    score, per_img = cider_d(cands, refs)
    assert score == pytest.approx(10.0, abs=1e-6)
    assert all(s == pytest.approx(10.0, abs=1e-6) for s in per_img)

    bad = toks(["x y z w"] * 4)
    score_bad, _ = cider_d(bad, refs)
    assert score_bad == pytest.approx(0.0, abs=1e-9)


def test_cider_partial_ordering():
    refs = [[c] for c in toks(CAPS)]
    partial = toks([
        "a dog runs on green grass near a tree",
        "two people walk across a sandy beach",
        "an industrial zone with many buildings",
        "a residential street with dense houses",
    ])
    s_partial, _ = cider_d(partial, refs)
    s_full, _ = cider_d(toks(CAPS), refs)
    assert 0.0 < s_partial < s_full


def test_coco_bleu_perfect_and_vs_nltk():
    cands = toks(CAPS)
    refs = [[c] for c in toks(CAPS)]
    bleus, _ = coco_bleu(cands, refs)
    for b in bleus:
        assert b == pytest.approx(1.0, rel=1e-6)

    # partial-overlap case vs nltk corpus_bleu (closest reflen, no smoothing)
    from nltk.translate.bleu_score import corpus_bleu

    cands2 = toks(["a dog runs on the green grass near the water and the trees"])
    refs2 = [[CAPS[0].split()]]
    ours, _ = coco_bleu(cands2, refs2)
    theirs = corpus_bleu(refs2, cands2, weights=(0.25, 0.25, 0.25, 0.25))
    assert ours[3] == pytest.approx(theirs, rel=1e-6)


def test_hf_bleu_matches_nltk_on_simple_case():
    from nltk.translate.bleu_score import corpus_bleu

    cands = toks(["a dog runs on the green grass near the water and trees"])
    refs = [[CAPS[0].split()]]
    ours = hf_bleu(cands, refs)
    theirs = corpus_bleu(refs, cands, weights=(0.25, 0.25, 0.25, 0.25))
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_rouge_l():
    score, _ = rouge_l(toks(CAPS), [[c] for c in toks(CAPS)])
    assert score == pytest.approx(1.0)
    # hand-computed: cand 'a b c', ref 'a c d' -> lcs=2, p=2/3, r=2/3, f=2/3
    score, _ = rouge_l([["a", "b", "c"]], [[["a", "c", "d"]]])
    assert score == pytest.approx(2 / 3, rel=1e-6)


def test_meteor_hand_case():
    # identical 5-token: m=5, chunks=1 -> 1 * (1 - 0.5*(1/5)^3) = 0.996
    s = single_meteor("a b c d e".split(), "a b c d e".split())
    assert s == pytest.approx(1.0 * (1 - 0.5 * (1 / 5) ** 3), rel=1e-9)
    assert single_meteor(["x"], ["y"]) == 0.0
    # stem stage: 'runs' vs 'running' share stem 'run'
    assert single_meteor(["running"], ["runs"]) > 0.0


def test_coco_caption_eval_end_to_end(tmp_path):
    import json

    gts = {str(i): [CAPS[i], CAPS[(i + 1) % 4]] for i in range(4)}
    ann = {
        "images": [{"id": k} for k in gts],
        "annotations": [
            {"image_id": k, "id": 10 * int(k) + j, "caption": c}
            for k in gts
            for j, c in enumerate(gts[k])
        ],
        "type": "captions",
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    preds = [{"image_id": str(i), "caption": CAPS[i]} for i in range(4)]
    m = coco_caption_eval(str(p), preds)
    assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}
    assert m["Bleu_4"] == pytest.approx(1.0, rel=1e-6)
    assert m["ROUGE_L"] == pytest.approx(1.0)
    assert m["CIDEr"] > 5.0


def test_normalize_image_ids():
    assert normalize_image_ids(["12", "12_3", "gal_7_1"]) == ["12", "12", "gal_7"]
    with pytest.raises(ValueError):
        normalize_image_ids(["a_b_c_d"])


def test_calc_metrics_sydney_fixture(tmp_path):
    from dmi_tpu.data.fixtures import generate_dataset

    root = str(tmp_path)
    generate_dataset(root, "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=8,
                     n_train=4, n_eval=4)
    # predict the ground truth for every eval row
    from dmi_tpu.evals.metrics import load_sydney_gts

    gts = load_sydney_gts(root, "val")
    ids, preds = [], []
    for img_id, caps in gts.items():
        for k, c in enumerate(caps):
            ids.append(f"{img_id}_{k}")
            preds.append(c)
    m = calc_metrics(preds, ids, "sydney", "exp0", "eval", data_root=root)
    for key in ("rouge1", "rouge2", "rougeL", "rougeLsum", "bleu", "meteor",
                "coco_cider", "coco_bleu", "coco_meteor", "coco_rouge"):
        assert key in m, key
    assert m["coco_rouge"] == pytest.approx(1.0)
    # fixture captions repeat across images (low idf), so perfect preds
    # land well below the 10.0 ceiling — sanity-check it's clearly positive
    assert m["coco_cider"] > 1.0


def test_calc_metrics_chebi_fixture(tmp_path):
    from dmi_tpu.data.fixtures import generate_dataset
    from dmi_tpu.evals.metrics import load_chebi_gts

    root = str(tmp_path)
    generate_dataset(root, "chebi20", "MolCA", mm_dim=8, n_train=4, n_eval=3)
    gts = load_chebi_gts(root, "validation")
    ids = list(gts.keys())
    preds = [gts[i] for i in ids]
    m = calc_metrics(preds, ids, "chebi20", "exp0", "eval", data_root=root)
    assert m["bleu"] == pytest.approx(100.0, rel=1e-6)
    assert m["rougeL"] == pytest.approx(100.0, rel=1e-6)
    assert m["meteor"] > 90.0


def test_calc_metrics_candels_fixture(tmp_path):
    from dmi_tpu.data.fixtures import generate_dataset

    root = str(tmp_path)
    generate_dataset(root, "candels", "zoobot-encoder-convnext_base", mm_dim=8,
                     n_train=4, n_eval=3)
    from dmi_tpu.evals.metrics import load_candels_gts

    gts = load_candels_gts(root, "validation")
    ids, preds = [], []
    for img_id, caps in gts.items():
        for k, c in enumerate(caps):
            ids.append(f"{img_id}_{k}")
            preds.append(c)
    m = calc_metrics(preds, ids, "candels", "exp0", "eval", data_root=root)
    assert m["coco_rouge"] == pytest.approx(1.0)
