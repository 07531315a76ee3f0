"""Evaluate a REFERENCE checkpoint whose state_dict carries the trainer's
`_dummy_param` (registered for the --no-nn ablation, train_hybrid.py:430-436),
which the reference's own evaluator cannot load (strict state_dict mismatch —
the train/eval pair is incompatible for its own ablation).

Uses the reference's model + metric code unmodified; only strips the dummy
key before loading. Usage:
    python benchmarks/ref_eval_fix.py <ckpt.pth> --data <csv> --output <csv>
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo/results/ref_head2head/_shims")  # arviz stub
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--data", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from eval.evaluate import evaluate_model, save_evaluation_results
    from models.hybrid_ode_nn import HybridODENN
    from train.train_hybrid import create_data_loaders

    device = torch.device("cpu")
    ckpt = torch.load(args.checkpoint, map_location=device)
    config = ckpt["config"]
    config["data"]["path"] = args.data
    _, _, test_loader = create_data_loaders(config)

    model = HybridODENN(
        ode_params=None,
        nn_hidden=config["model"]["nn_hidden"],
        nn_layers=config["model"]["nn_layers"],
        use_variational=False,
        device=device,
    ).to(device)
    state = dict(ckpt["model_state_dict"])
    state.pop("_dummy_param", None)
    model.load_state_dict(state)

    metrics = evaluate_model(model, test_loader, device)
    metrics["checkpoint_epoch"] = ckpt.get("epoch", -1)
    metrics["checkpoint_val_loss"] = ckpt.get("val_loss", -1)
    save_evaluation_results(metrics, args.output)
    print({k: v for k, v in metrics.items() if "rmse" in k})


if __name__ == "__main__":
    main()
