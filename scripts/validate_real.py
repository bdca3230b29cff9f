"""Gated real-weights parity harness.

Zero-egress environments cannot download meta-llama/Llama-3.2-1B-Instruct
or the ospanbatyr/dmi_embs embedding archives, so reference-number
reproduction (BASELINE.md's TBD table) cannot run here.  This script
encodes that debt as a RUNNABLE gate instead of a TODO: whenever the
artifacts appear it validates everything and fills BASELINE.md
automatically; otherwise it reports exactly what is missing and exits 0.

Stages (each gated on its artifact):

1. HF weights present (local cache / HF_HOME / DMI_LM_PATH):
   - logits parity: JAX forward vs transformers on random soft-prefix
     embeddings (atol 1e-2 bf16 / 1e-3 f32 on valid rows)
   - greedy parity: token-exact decode vs model.generate
2. Real Sydney RemoteCLIP-RN50 pkls present under data/sydney:
   - run the literal reference config
     configs/projector/v2:llama1b_sydney_rn50_mlp2.json end-to-end
     (train -> decode -> CIDEr -> results JSON)
   - measure decode captions/s on the eval set
3. Write the measured rows into BASELINE.md between the AUTO markers.

Tested offline via the fixture path: DMI_VALIDATE_REAL_FIXTURE=1 generates
synthetic pkls + uses the test:tiny LM so the whole flow (including the
BASELINE.md rewrite) is exercised without the real artifacts
(tests/test_validate_real.py).

Usage: python scripts/validate_real.py [--data-root data] [--out BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import re
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

LM_NAME = "meta-llama/Llama-3.2-1B-Instruct"
# the vendored experiment surface (semantic-parity-tested vs the mounted
# reference; tests/test_config.py)
SYDNEY_CONFIG = "configs/experiments/projector/v2:llama1b_sydney_rn50_mlp2.json"

AUTO_BEGIN = "<!-- validate_real:begin -->"
AUTO_END = "<!-- validate_real:end -->"


def hf_weights_available() -> bool:
    if os.environ.get("DMI_VALIDATE_REAL_FIXTURE") == "1":
        return True
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained(
            os.environ.get("DMI_LM_PATH", LM_NAME), local_files_only=True
        )
        return True
    except Exception:
        return False


def sydney_pkls_available(data_root: str) -> bool:
    if os.environ.get("DMI_VALIDATE_REAL_FIXTURE") == "1":
        return True
    need = [
        osp.join(data_root, "sydney", f"{split}_embs_RemoteCLIP-RN50.pkl")
        for split in ("train", "val", "test")
    ]
    return all(osp.exists(p) for p in need)


def check_logits_and_greedy_parity() -> dict:
    """JAX Llama vs transformers on the real (or fixture) weights."""
    import torch

    import jax.numpy as jnp

    from dmi_tpu.models import decode, llama

    fixture = os.environ.get("DMI_VALIDATE_REAL_FIXTURE") == "1"
    if fixture:
        import transformers

        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rope_theta=10000.0, tie_word_embeddings=True,
            bos_token_id=0, eos_token_id=[5], pad_token_id=5,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()
        cfg = llama.tiny_config(eos=(5,))
        pad_id = 5
    else:
        import transformers

        name = os.environ.get("DMI_LM_PATH", LM_NAME)
        hf = transformers.AutoModelForCausalLM.from_pretrained(
            name, torch_dtype=torch.float32, local_files_only=True
        ).eval()
        tok = transformers.AutoTokenizer.from_pretrained(name, local_files_only=True)
        from dmi_tpu.training.model_utils import _hf_to_config

        cfg = _hf_to_config(hf.config, jnp.float32, tok)
        pad_id = tok.eos_token_id
    params = llama.from_hf_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    B, T = 2, 7
    embeds = rng.normal(size=(B, T, cfg.hidden_size)).astype(np.float32) * 0.05

    ours = np.asarray(llama.forward(cfg, params, jnp.asarray(embeds)))
    with torch.no_grad():
        theirs = hf(inputs_embeds=torch.tensor(embeds)).logits.float().numpy()
    max_abs = float(np.max(np.abs(ours - theirs)))

    max_new = 10
    toks = np.asarray(
        decode.greedy_generate(cfg, params, jnp.asarray(embeds), max_new, pad_id)
    )
    with torch.no_grad():
        hf_toks = hf.generate(
            inputs_embeds=torch.tensor(embeds), max_new_tokens=max_new,
            do_sample=False, pad_token_id=pad_id,
        ).numpy()
    W = hf_toks.shape[1]
    greedy_exact = bool((toks[:, :W] == hf_toks).all())
    return {
        "logits_max_abs_diff": max_abs,
        # fixture bound 3e-3: XLA-CPU vs oneDNN f32 accumulation-order noise
        # measured up to ~1.6e-3 on the tiny model; real mask/rope/layout
        # bugs produce O(1) differences
        "logits_ok": max_abs < (1e-2 if not fixture else 3e-3),
        "greedy_token_exact": greedy_exact,
    }


def run_sydney_config(data_root: str) -> dict:
    """End-to-end literal reference config -> CIDEr + decode throughput."""
    fixture = os.environ.get("DMI_VALIDATE_REAL_FIXTURE") == "1"
    if fixture:
        from dmi_tpu.data.fixtures import generate_dataset

        if not osp.exists(osp.join(data_root, "sydney")):
            generate_dataset(
                data_root, "sydney", "RemoteCLIP-RN50-Unchanged", mm_dim=32,
                n_train=4, n_eval=2, seed=0,
            )
        os.environ.setdefault("DMI_LM_OVERRIDE", "test:tiny")
        cfg = {
            "output_dir": "proj_vr", "train_batch_size": 4, "eval_batch_size": 4,
            "learning_rate": 1e-3, "epochs_l": [1], "dataset_size_l": ["full"],
            "warmup_steps": 1, "scheduler": "cosine_warmup", "logging_steps": 4,
            "save_steps": 4, "eval_steps": 4, "generate_steps": 4, "seeds": [7],
            "pad_to_multiple_of": 8,
            "menc_names_or_paths": ["chendelong/RemoteCLIP-RN50-Unchanged"],
            "mm_dim": 32, "load_extracted_features": [True],
            "lm_name_or_path": "test:tiny", "lm_dtype": "float32",
            "dataset_names_or_paths": ["sydney"], "proj_name_or_path": "proj_vr",
            "proj_arch": "mlp", "proj_n_layers": 2, "proj_dropout": 0.1,
            "output_root": "outputs",
        }
        cfg_path = "cfg_validate_real.json"
        json.dump(cfg, open(cfg_path, "w"))
        run_name = "cfg_validate_real"
        train_type = "projector"
    else:
        cfg_path = osp.join(REPO, SYDNEY_CONFIG)
        run_name = osp.splitext(osp.basename(cfg_path))[0]
        train_type = "projector"

    from dmi_tpu.train_projector import run as run_projector

    t0 = time.perf_counter()
    run_projector(cfg_path)
    wall_s = time.perf_counter() - t0

    results_glob = [
        f
        for f in os.listdir("outputs")
        if f.startswith(f"{train_type}:{run_name}") and f.endswith("-results.json")
    ]
    results = json.load(open(osp.join("outputs", sorted(results_glob)[0])))
    enc = next(iter(results["metrics"]))
    m = results["metrics"][enc]
    n_caps = len(results["preds"][enc])
    return {
        "config": osp.basename(cfg_path),
        "coco_cider": m.get("coco_cider"),
        "coco_bleu": m.get("coco_bleu"),
        "bleu": m.get("bleu"),
        "n_test_captions": n_caps,
        "wall_s_total": round(wall_s, 1),
    }


def measure_decode_throughput() -> dict:
    """Single-batch decode rate at the sydney budget on the current backend."""
    import subprocess

    env = dict(os.environ)
    if os.environ.get("DMI_VALIDATE_REAL_FIXTURE") == "1":
        env["DMI_BENCH_SMALL"] = "1"
        env["DMI_BENCH_ITERS"] = "2"
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def update_baseline_md(path: str, rows: dict) -> None:
    block = [
        AUTO_BEGIN,
        "## Measured by scripts/validate_real.py",
        "",
        "```json",
        json.dumps(rows, indent=2),
        "```",
        AUTO_END,
    ]
    text = open(path).read() if osp.exists(path) else "# BASELINE\n"
    block_text = "\n".join(block)
    if AUTO_BEGIN in text:
        text = re.sub(
            re.escape(AUTO_BEGIN) + r".*?" + re.escape(AUTO_END),
            block_text,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + block_text + "\n"
    open(path, "w").write(text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--out", default=osp.join(REPO, "BASELINE.md"))
    args = ap.parse_args()

    if os.environ.get("DMI_VALIDATE_REAL_FIXTURE") == "1":
        # fixture mode is a CPU smoke; sitecustomize ignores JAX_PLATFORMS
        # (it pins "axon,cpu" itself), so force CPU through jax.config —
        # otherwise the tiny fixture run goes through the TPU relay
        import jax

        jax.config.update("jax_platforms", "cpu")

    rows = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    ran_any = False

    if hf_weights_available():
        print("[validate_real] HF weights found: running logits+greedy parity")
        rows["hf_parity"] = check_logits_and_greedy_parity()
        ran_any = True
        assert rows["hf_parity"]["greedy_token_exact"], rows["hf_parity"]
    else:
        print(f"[validate_real] SKIP parity: no local {LM_NAME} cache")

    if sydney_pkls_available(args.data_root):
        print("[validate_real] sydney pkls found: running the v2 RN50 config")
        rows["sydney_v2_rn50"] = run_sydney_config(args.data_root)
        rows["decode_bench"] = measure_decode_throughput()
        ran_any = True
    else:
        print("[validate_real] SKIP e2e: data/sydney/*_embs_RemoteCLIP-RN50.pkl absent")

    # same-hardware decode ratio vs the reference's torch path (the
    # runnable stand-in for the impossible CUDA-side measurement; see
    # BASELINE.md "Measured same-hardware software ratio").  Needs no
    # artifacts, but only piggybacks on a run that found some (or the
    # fixture smoke) — a bare environment still "exits cleanly".
    if ran_any:
        import subprocess

        ratio_args = ["--tiny"] if os.environ.get(
            "DMI_VALIDATE_REAL_FIXTURE") == "1" else []
        r = subprocess.run(
            [sys.executable, osp.join(REPO, "scripts", "cpu_decode_ratio.py"),
             *ratio_args],
            capture_output=True, text=True, timeout=3600,
        )
        if r.returncode == 0:
            rows["cpu_decode_ratio"] = json.loads(
                r.stdout.strip().splitlines()[-1]
            )
        else:
            print("[validate_real] SKIP cpu ratio:", r.stderr[-200:])

    if ran_any:
        update_baseline_md(args.out, rows)
        print(f"[validate_real] wrote results into {args.out}")
        print(json.dumps(rows, indent=2))
    else:
        print("[validate_real] nothing runnable in this environment; exiting cleanly")


if __name__ == "__main__":
    main()
