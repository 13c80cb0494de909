"""Head-to-head: gptorch_tpu vs the reference gptorch on identical data.

The round bar is "matching-or-beating the reference", so this bench runs
BOTH frameworks — the reference (torch, f64, CPU; imported live from
/root/reference) and this repo — on byte-identical train/test splits and
compares what a user actually gets:

* final NLML (the training objective, ``model.loss()`` both sides),
* test RMSE and Gaussian NLPD (both in original y units),
* wall-clock for the optimize() call.

Configs (judge-specified, VERDICT.md round 3 item 1):

* ``example1d``  — the reference's own example config: n=100 draws of
  sin(2πx)+cos(3.5πx)−3x+5 with σ=0.1 noise, kernel
  Linear+Rbf+Constant, L-BFGS-B ×100
  (/root/reference/examples/regression_1d.py:36-53).
* ``diabetes``   — sklearn's bundled diabetes set (n=442, d=10; the one
  REAL dataset available with zero egress), seeded 90/10 split,
  train-standardized, Rbf, L-BFGS-B ×100.
* ``synthetic4k`` — n=4096, d=8 smooth synthetic, Rbf ARD, Adam ×50:
  the mid-size config where TPU wall-clock dominates CPU torch.

Each (framework, config) runs in its own subprocess so platform/dtype are
controlled per run: the reference is always torch-f64-CPU (torch has no
TPU backend here); this repo runs f64 CPU for the two small statistical
configs (exactness — matching the reference's f64) and default-platform
f32 for synthetic4k (the throughput leg; TPU when available).

For synthetic4k the two sides train in different dtypes (TPU f32 + the
documented fast_jitter stabilizer vs torch f64), so self-reported losses
are not comparable.  Both sides therefore emit their trained CONSTRAINED
hyperparameters and a neutral f64-CPU scorer subprocess (this repo,
``fast=False`` dense path, zero jitter) evaluates the TRUE NLML of each
side's hyperparameters on the same data; the scored values decide the
verdict.  The explicit noise start (0.1) is shared by both sides: the
reference's default heuristic 0.001·var(y) ≈ 1.5e-3 sits below the f32
fused-path factorization floor (CLAUDE.md), and a shared start is required
for a like-for-like optimizer trajectory anyway.

Output: one JSON line per config
  {"metric": "parity_<config>", "value": <wall speedup ref/tpu>,
   "unit": "x_wallclock", "vs_baseline": <ref_nlml - tpu_nlml>, ...}
with the full per-framework numbers in the record.  ``vs_baseline`` > 0
(or ≈ 0) means this repo's optimized NLML matches-or-beats the
reference's.  A trailing "parity_verdict" line aggregates pass/fail:
pass = on every config tpu NLML ≤ ref NLML + tol AND tpu RMSE/NLPD ≤
ref·(1+tol_rel).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REFERENCE_PATH = "/root/reference"

# ---------------------------------------------------------------------------
# configs

CONFIGS = {
    "example1d": dict(kernel="lin+rbf+const", method="L-BFGS-B", max_iter=100),
    "diabetes": dict(kernel="rbf", method="L-BFGS-B", max_iter=100),
    "synthetic4k": dict(
        kernel="rbf_ard", method="Adam", max_iter=50, noise_start=0.1,
        scored=True,
    ),
    # Sparse head-to-heads (VERDICT r4 item 5): the reference's VFE on its
    # own example config (/root/reference/examples/regression_1d.py:89-95
    # supports --model-type VFE) and its SVGP
    # (/root/reference/gptorch/models/sparse_gpr.py:219-308), both with a
    # SHARED explicit inducing set Z (the reference's kmeans init is
    # unseeded scipy) and shared noise start.  Both sides minimize the
    # same bound (negative collapsed VFE / negative ELBO), so "nlml" is
    # directly comparable.
    "vfe1d": dict(
        kernel="lin+rbf+const", method="L-BFGS-B", max_iter=100,
        model="VFE", m=10, data="example1d",
    ),
    "svgp_diabetes": dict(
        kernel="rbf", method="Adam", max_iter=100,
        model="SVGP", m=32, data="diabetes", noise_start=0.1,
        y_standardize=True,  # raw y scale ~75: noise start 0.1 would be
        # 6 log-units off for both sides; standardized units make the
        # fixed Adam budget meaningful
    ),
}

# NLML tolerance: both sides minimize the same objective from the same
# init; L-BFGS-B termination differences leave O(1e-2) slack on these
# scales.  RMSE/NLPD relative tolerance covers optimizer path noise.
NLML_TOL = 0.05
REL_TOL = 0.02


def _example1d_f(x):
    return np.sin(2.0 * np.pi * x) + np.cos(3.5 * np.pi * x) - 3.0 * x + 5.0


def make_z(config, x):
    """Shared inducing inputs for the sparse configs: a seeded random
    subset of x (both frameworks receive the same Z, removing the
    reference's unseeded scipy-kmeans init from the comparison)."""
    m = CONFIGS[config].get("m")
    if m is None:
        return None
    rng = np.random.RandomState(1234)
    return x[rng.permutation(x.shape[0])[:m]].copy()


def make_data(config):
    """Returns (x, y, xt, yt) float64 numpy arrays, seeded per config."""
    spec = CONFIGS[config]
    x, y, xt, yt = _make_base(spec.get("data", config))
    if spec.get("y_standardize"):
        mu, sd = y.mean(), y.std()
        y, yt = (y - mu) / sd, (yt - mu) / sd
    return x, y, xt, yt


def _make_base(config):
    if config == "example1d":
        # Reference examples/regression_1d.py:36-40 (seed 42, σ=0.1).
        rng = np.random.RandomState(42)
        n = 100
        x = np.linspace(0, 1, n).reshape((-1, 1))
        y = _example1d_f(x) + 0.1 * rng.randn(n, 1)
        rng_t = np.random.RandomState(142)
        xt = np.linspace(0.0, 1.0, 200).reshape((-1, 1))
        yt = _example1d_f(xt) + 0.1 * rng_t.randn(200, 1)
        return x, y, xt, yt
    if config == "diabetes":
        from sklearn.datasets import load_diabetes

        data = load_diabetes()
        x, y = data.data, data.target.reshape((-1, 1))
        rng = np.random.RandomState(0)
        perm = rng.permutation(x.shape[0])
        n_train = int(0.9 * x.shape[0])
        tr, te = perm[:n_train], perm[n_train:]
        x, xt, y, yt = x[tr], x[te], y[tr], y[te]
        mu, sd = x.mean(0), x.std(0) + 1e-12
        x, xt = (x - mu) / sd, (xt - mu) / sd
        return x, y, xt, yt
    if config == "synthetic4k":
        rng = np.random.RandomState(7)
        n, nt, d = 4096, 1024, 8
        x = rng.rand(n + nt, d) * 2.0 - 1.0
        w = rng.randn(d, 3)
        f = (
            np.sin(x @ w[:, :1] * 2.0)
            + 0.5 * np.cos(x @ w[:, 1:2] * 3.0)
            + 0.25 * (x @ w[:, 2:3]) ** 2
        )
        y = f + 0.1 * rng.randn(n + nt, 1)
        return x[:n], y[:n], x[n:], y[n:]
    raise ValueError(config)


# ---------------------------------------------------------------------------
# workers


def _gaussian_nlpd(yt, mean, var):
    var = np.maximum(var, 1e-300)
    return float(
        np.mean(0.5 * np.log(2.0 * np.pi * var) + 0.5 * (yt - mean) ** 2 / var)
    )


def _metrics(yt, mean, var):
    rmse = float(np.sqrt(np.mean((yt - mean) ** 2)))
    return rmse, _gaussian_nlpd(yt, mean, var)


def run_reference(config, x, y, xt, yt, z=None):
    sys.path.insert(0, REFERENCE_PATH)
    import torch

    from gptorch import kernels, likelihoods
    from gptorch.models.gpr import GPR
    from gptorch.models.sparse_gpr import SVGP, VFE

    torch.manual_seed(0)
    np.random.seed(0)  # SVGP._init_posterior subsamples via np.random
    d = x.shape[1]
    spec = CONFIGS[config]
    if spec["kernel"] == "lin+rbf+const":
        kern = kernels.Linear(d) + kernels.Rbf(d) + kernels.Constant(d)
    elif spec["kernel"] == "rbf":
        kern = kernels.Rbf(d)
    else:  # rbf_ard
        kern = kernels.Rbf(d, ARD=True)
    lik = (
        likelihoods.Gaussian(variance=spec["noise_start"])
        if "noise_start" in spec
        else None
    )
    model_type = spec.get("model", "GPR")
    if model_type == "VFE":
        model = VFE(x, y, kern, inducing_points=z, likelihood=lik)
    elif model_type == "SVGP":
        # batch_size=None: full-batch ELBO, removing host-RNG minibatch
        # noise from the head-to-head (ref sparse_gpr.py:198-216).
        model = SVGP(
            x, y, kern, inducing_points=z,
            likelihood=lik if lik is not None else likelihoods.Gaussian(),
            batch_size=None,
        )
    else:
        model = GPR(x, y, kern, likelihood=lik)

    t0 = time.perf_counter()
    model.optimize(method=spec["method"], max_iter=spec["max_iter"], verbose=False)
    wall = time.perf_counter() - t0
    nlml = float(model.loss())

    params = None
    if spec["kernel"] in ("rbf", "rbf_ard") and model_type == "GPR":
        params = dict(
            kernel_variance=float(model.kernel.variance.transform()),
            length_scales=np.asarray(
                model.kernel.length_scales.transform().detach()
            ).ravel().tolist(),
            noise_variance=float(model.likelihood.variance.transform()),
        )

    with torch.no_grad():
        mu, s = model.predict_y(xt)
    # predict_y's decorator returns numpy for numpy input; accept either.
    mu = np.asarray(mu.detach() if hasattr(mu, "detach") else mu)
    var = np.asarray(s.detach() if hasattr(s, "detach") else s)
    mu, var = mu.reshape(yt.shape), var.reshape(yt.shape)
    rmse, nlpd = _metrics(yt, mu, var)
    return dict(
        framework="reference",
        platform="torch-cpu",
        dtype="float64",
        nlml=nlml,
        rmse=rmse,
        nlpd=nlpd,
        wall_opt_s=wall,
        params=params,
    )


def run_tpu(config, x, y, xt, yt, platform, x64, z=None):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import GPR, SVGP, VFE

    np.random.seed(0)
    d = x.shape[1]
    spec = CONFIGS[config]
    if spec["kernel"] == "lin+rbf+const":
        kern = kernels.Linear(d) + kernels.Rbf(d) + kernels.Constant(d)
    elif spec["kernel"] == "rbf":
        kern = kernels.Rbf(d)
    else:
        kern = kernels.Rbf(d, ARD=True)
    dt = np.float64 if x64 else np.float32
    extra = {}
    if "noise_start" in spec:
        extra["likelihood"] = likelihoods.Gaussian(variance=spec["noise_start"])
    model_type = spec.get("model", "GPR")
    if model_type == "VFE":
        model = VFE(x.astype(dt), y.astype(dt), kern,
                    inducing_points=z.astype(dt), **extra)
    elif model_type == "SVGP":
        model = SVGP(x.astype(dt), y.astype(dt), kern,
                     inducing_points=z.astype(dt), batch_size=None, **extra)
    else:
        if not x64:
            # f32 fused-path stabilizer (the documented production setting,
            # CLAUDE.md); the scored f64 NLML below is jitter-free.
            extra["fast_jitter"] = 1e-3
        model = GPR(x.astype(dt), y.astype(dt), kern, **extra)

    t0 = time.perf_counter()
    model.optimize(method=spec["method"], max_iter=spec["max_iter"], verbose=False)
    wall = time.perf_counter() - t0
    nlml = float(model.loss())

    params = None
    if spec["kernel"] in ("rbf", "rbf_ard") and model_type == "GPR":
        params = dict(
            kernel_variance=float(np.asarray(model.kernel.variance.value)),
            length_scales=np.asarray(
                model.kernel.length_scales.value
            ).ravel().tolist(),
            noise_variance=float(np.asarray(model.likelihood.variance.value)),
        )

    mu, var = model.predict_y(xt.astype(dt))
    mu = np.asarray(mu).reshape(yt.shape).astype(np.float64)
    var = np.asarray(var).reshape(yt.shape).astype(np.float64)
    rmse, nlpd = _metrics(yt, mu, var)
    return dict(
        framework="gptorch_tpu",
        platform=jax.default_backend(),
        dtype="float64" if x64 else "float32",
        nlml=nlml,
        rmse=rmse,
        nlpd=nlpd,
        wall_opt_s=wall,
        params=params,
    )


def run_scorer(config, x, y, params):
    """Neutral f64 NLML of the given CONSTRAINED hyperparameters: dense
    exact-GPR path (fast=False), zero jitter, CPU float64 — the same
    objective both frameworks claim to minimize, free of either side's
    training dtype/jitter."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import GPR

    d = x.shape[1]
    ls = np.asarray(params["length_scales"], np.float64)
    kern = kernels.Rbf(
        d,
        variance=params["kernel_variance"],
        length_scales=ls if ls.size > 1 else float(ls[0]),
        ARD=ls.size > 1,
    )
    model = GPR(
        x.astype(np.float64),
        y.astype(np.float64),
        kern,
        likelihood=likelihoods.Gaussian(variance=params["noise_variance"]),
        fast=False,
    )
    return dict(nlml_scored=float(model.loss()))


def worker_main(args):
    data = np.load(args.data)
    x, y, xt, yt = data["x"], data["y"], data["xt"], data["yt"]
    z = data["z"] if "z" in data.files else None
    if args.worker == "ref":
        rec = run_reference(args.config, x, y, xt, yt, z=z)
    elif args.worker == "score":
        with open(args.params) as fh:
            params = json.load(fh)
        rec = run_scorer(args.config, x, y, params)
    else:
        rec = run_tpu(
            args.config, x, y, xt, yt, platform=args.platform, x64=args.x64,
            z=z,
        )
    with open(args.out, "w") as fh:
        json.dump(rec, fh)


# ---------------------------------------------------------------------------
# orchestrator


def _spawn(worker, config, data_path, extra=()):
    out = tempfile.NamedTemporaryFile(
        suffix=".json", delete=False, dir=tempfile.gettempdir()
    )
    out.close()
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        worker,
        "--config",
        config,
        "--data",
        data_path,
        "--out",
        out.name,
        *extra,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd=os.path.dirname(
            os.path.abspath(__file__)
        )
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{worker}/{config} failed:\n{proc.stdout}\n{proc.stderr}"
        )
    with open(out.name) as fh:
        rec = json.load(fh)
    os.unlink(out.name)
    return rec


def orchestrate(configs):
    verdicts = []
    for config in configs:
        x, y, xt, yt = make_data(config)
        z = make_z(config, x)
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as fh:
            arrays = dict(x=x, y=y, xt=xt, yt=yt)
            if z is not None:
                arrays["z"] = z
            np.savez(fh, **arrays)
            data_path = fh.name

        small = config != "synthetic4k"
        tpu_extra = ["--platform", "cpu", "--x64"] if small else []
        ref = _spawn("ref", config, data_path)
        tpu = _spawn("tpu", config, data_path, tpu_extra)

        if CONFIGS[config].get("scored"):
            # Neutral f64 re-scoring of both sides' trained hyperparameters
            # (see module docstring).
            for rec in (ref, tpu):
                with tempfile.NamedTemporaryFile(
                    "w", suffix=".json", delete=False
                ) as fh:
                    json.dump(rec["params"], fh)
                    params_path = fh.name
                scored = _spawn(
                    "score", config, data_path, ["--params", params_path]
                )
                os.unlink(params_path)
                rec["nlml_scored"] = scored["nlml_scored"]
        os.unlink(data_path)

        ref_nlml = ref.get("nlml_scored", ref["nlml"])
        tpu_nlml = tpu.get("nlml_scored", tpu["nlml"])
        speedup = ref["wall_opt_s"] / max(tpu["wall_opt_s"], 1e-9)
        nlml_margin = ref_nlml - tpu_nlml  # > 0: we found a lower NLML
        # L-BFGS-B configs converge to the same optimum: tight absolute tol.
        # The Adam config is partially converged after a fixed step budget
        # and the two Adam implementations differ: 0.5% relative slack.
        nlml_tol = (
            max(NLML_TOL, 0.005 * abs(ref_nlml))
            if CONFIGS[config]["method"] == "Adam"
            else NLML_TOL
        )
        ok = (
            tpu_nlml <= ref_nlml + nlml_tol
            and tpu["rmse"] <= ref["rmse"] * (1 + REL_TOL)
            and tpu["nlpd"] <= ref["nlpd"] + max(abs(ref["nlpd"]) * REL_TOL, 0.02)
        )
        verdicts.append(ok)
        print(
            json.dumps(
                {
                    "metric": f"parity_{config}",
                    "value": round(speedup, 3),
                    "unit": "x_wallclock_vs_reference",
                    "vs_baseline": round(nlml_margin, 6),
                    "pass": ok,
                    "ref": {k: round(v, 6) if isinstance(v, float) else v
                            for k, v in ref.items()},
                    "tpu": {k: round(v, 6) if isinstance(v, float) else v
                            for k, v in tpu.items()},
                }
            )
        )
        print(
            f"# {config}: NLML ref {ref_nlml:.4f} vs tpu {tpu_nlml:.4f} | "
            f"RMSE {ref['rmse']:.4f} vs {tpu['rmse']:.4f} | "
            f"NLPD {ref['nlpd']:.4f} vs {tpu['nlpd']:.4f} | "
            f"wall {ref['wall_opt_s']:.2f}s vs {tpu['wall_opt_s']:.2f}s "
            f"({speedup:.1f}x) [{'PASS' if ok else 'FAIL'}]",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "parity_verdict",
                "value": int(all(verdicts)),
                "unit": "all_configs_match_or_beat",
                "vs_baseline": sum(verdicts) / max(len(verdicts), 1),
            }
        )
    )
    return all(verdicts)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--worker", choices=["ref", "tpu", "score"])
    p.add_argument("--config", default=None)
    p.add_argument("--data")
    p.add_argument("--out")
    p.add_argument("--platform", default="default")
    p.add_argument("--x64", action="store_true")
    p.add_argument("--params", help="JSON file of constrained hyperparameters"
                   " (score worker)")
    p.add_argument(
        "--configs",
        default=os.environ.get("PARITY_CONFIGS", ",".join(CONFIGS)),
        help="comma-separated subset to run (orchestrator mode)",
    )
    args = p.parse_args()
    if args.worker:
        worker_main(args)
        return
    configs = [c for c in args.configs.split(",") if c]
    ok = orchestrate(configs)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
