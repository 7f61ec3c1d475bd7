"""Published-checkpoint parity harness.

The reference's README publishes zero-shot retrieval and recognition numbers
from two Google-Drive checkpoints (`/root/reference/README.md:42-49`,
loaded at main_vl.py:327-346).  Those blobs (and real Fashion-Gen) are not
present in this build environment, so metric parity cannot be *demonstrated*
here — this module makes it one command away in any environment that has
them:

    scripts/verify_parity.sh --data-path <fashion_gen_root> \
        [--retrieval-pth checkpoint_retrieval.pth] \
        [--recognition-pth checkpoint_recognition.pth]

For each supplied checkpoint it drives the exact CLI flow the README
documents (converter -> `--eval-retrieval-{itr,tir} --parity-heads` /
`--eval-recognition`) and asserts the published numbers within the stated
tolerance.  Checks whose inputs are absent SKIP with a clear message (exit
0); any numeric mismatch FAILs (exit 1).

Tolerance policy (fixed here so it cannot be bent after the fact):
  * retrieval acc@k: +/- 0.010 absolute.  The protocol divides by a fixed
    1000 (engine_grid_masking.py:393) so scores are quantized at 0.001;
    the budget covers bf16-vs-fp16 logit noise flipping near-tie rankings
    (~a few queries) plus PIL-dither bbox-crop deltas (SURVEY §7 hard
    part 2).  Run with --fp32 to tighten by hand if desired.
  * recognition accuracy: +/- 0.005 absolute; macro-F1: +/- 0.010 (macro-F1
    amplifies single-sample flips in rare classes).
"""

from __future__ import annotations

import argparse
import os
import sys

# README.md:42-49 (duplicated in BASELINE.md).
EXPECTED = {
    "retrieval-tir": {"acc@1": 0.346, "acc@5": 0.780, "acc@10": 0.895},
    "retrieval-itr": {"acc@1": 0.331, "acc@5": 0.772, "acc@10": 0.911},
    "recognition": {
        "sup_accuracy": 0.9825996064928677,
        "sup_macro_f1": 0.8954719842489123,
        "sub_accuracy": 0.9356554353172651,
        "sub_macro_f1": 0.8285927576055913,
    },
}
TOL = {"retrieval": 0.010, "accuracy": 0.005, "macro_f1": 0.010}


def _check(name: str, got: dict, want: dict, tol_of) -> list:
    fails = []
    for k, exp in want.items():
        tol = tol_of(k)
        val = float(got[k])
        ok = abs(val - exp) <= tol
        print(f"  {name} {k}: got {val:.4f}  expected {exp:.4f} "
              f"(+/-{tol})  {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            fails.append(f"{name}.{k}: {val:.4f} vs {exp:.4f}")
    return fails


def main(argv=None) -> int:
    p = argparse.ArgumentParser("published-checkpoint parity harness")
    p.add_argument("--data-path", required=True,
                   help="Fashion-Gen root (retrieve_ITR/, retrieve_TIR/, "
                        "extracted_valid_images/, full_valid_info_PAI/)")
    p.add_argument("--retrieval-pth", default="checkpoints/checkpoint_retrieval.pth")
    p.add_argument("--recognition-pth", default="checkpoints/checkpoint_recognition.pth")
    p.add_argument("--config", default="configs/pretrain_exp21.py")
    p.add_argument("--expected-override", default="",
                   help="JSON file overriding EXPECTED (test fixtures)")
    p.add_argument("--skip-retrieval", action="store_true")
    p.add_argument("--skip-recognition", action="store_true")
    args = p.parse_args(argv)

    expected = EXPECTED
    if args.expected_override:
        import json

        with open(args.expected_override) as f:
            expected = json.load(f)

    from mvlt_tpu.cli import main as cli_main

    fails: list = []
    ran = 0

    def cli(extra):
        return cli_main(["--config", args.config,
                         "--data-path", args.data_path] + extra)

    if not args.skip_retrieval:
        if not os.path.exists(args.retrieval_pth):
            print(f"SKIP retrieval parity: checkpoint not found at "
                  f"{args.retrieval_pth} (download checkpoint_retrieval.pth "
                  f"per the reference README and pass --retrieval-pth)",
                  flush=True)
        elif not os.path.isdir(os.path.join(args.data_path, "retrieve_ITR")):
            print(f"SKIP retrieval parity: {args.data_path}/retrieve_ITR "
                  f"missing (needs the reference's pickled 101-candidate "
                  f"bundles)", flush=True)
        else:
            for direction in ("itr", "tir"):
                got = cli([f"--eval-retrieval-{direction}", "--parity-heads",
                           "--resume", args.retrieval_pth])
                fails += _check(f"retrieval-{direction}", got,
                                expected[f"retrieval-{direction}"],
                                lambda k: TOL["retrieval"])
                ran += 1

    if not args.skip_recognition:
        if not os.path.exists(args.recognition_pth):
            print(f"SKIP recognition parity: checkpoint not found at "
                  f"{args.recognition_pth}", flush=True)
        elif not os.path.isdir(os.path.join(args.data_path, "extracted_valid_images")):
            print(f"SKIP recognition parity: {args.data_path}/"
                  f"extracted_valid_images missing", flush=True)
        else:
            got = cli(["--eval-recognition", "--resume", args.recognition_pth])
            fails += _check(
                "recognition", got, expected["recognition"],
                lambda k: TOL["accuracy"] if k.endswith("accuracy") else TOL["macro_f1"])
            ran += 1

    if fails:
        print(f"PARITY FAIL ({len(fails)} metric(s) out of tolerance):", flush=True)
        for f in fails:
            print(f"  {f}", flush=True)
        return 1
    print(f"PARITY {'OK' if ran else 'SKIPPED'} "
          f"({ran} protocol run(s) checked)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
