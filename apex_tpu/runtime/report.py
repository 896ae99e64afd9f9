"""PDF report generation for the eval suites.

Rebuilds the reference's report artifacts — the "5k" pass-rate PDF
(5k_test.py:230-285, fpdf), the perturbation polar plot
(tools/eval_perturb.py:214-255, matplotlib savefig) and the two-policy
comparison PDF (tools/compare_pols.py:93-182) — on matplotlib's PdfPages
backend (fpdf is not in the image; the content parity is the tables/plots,
not the library).
"""
from __future__ import annotations

import numpy as np


def _pdf(path):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.backends.backend_pdf import PdfPages

    return PdfPages(path)


def report_5k(result: dict, path: str, title: str = "5k robustness matrix"):
    """result = eval_suites.eval_5k_matrix(...) output. One page per
    foot-mass x slope cell with a speed x friction pass table, plus a
    summary page (5k_test.py report_stats equivalent)."""
    import matplotlib.pyplot as plt

    grid = result["grid"]
    passed = np.asarray(result["passed"], dtype=float)
    speeds = list(grid["speeds"])
    frictions = list(grid["frictions"])
    fmasses = list(grid["foot_mass_scales"])
    slopes = list(grid["slopes"])

    with _pdf(path) as pdf:
        fig, ax = plt.subplots(figsize=(8.5, 3))
        ax.axis("off")
        ax.set_title(title)
        ax.text(0.02, 0.6, f"overall pass rate: {result['pass_rate']:.3f}",
                fontsize=14)
        ax.text(0.02, 0.35,
                f"grid: speeds={speeds} frictions={frictions} "
                f"foot-mass x{fmasses} slopes={slopes}", fontsize=9)
        pdf.savefig(fig)
        plt.close(fig)

        for mi, fm in enumerate(fmasses):
            for si, sl in enumerate(slopes):
                cell = passed[:, :, mi, si]           # (speeds, frictions)
                fig, ax = plt.subplots(figsize=(6, 4))
                im = ax.imshow(cell, vmin=0, vmax=1, cmap="RdYlGn",
                               aspect="auto")
                ax.set_xticks(range(len(frictions)),
                              [f"{f:g}" for f in frictions])
                ax.set_yticks(range(len(speeds)), [f"{s:g}" for s in speeds])
                ax.set_xlabel("friction")
                ax.set_ylabel("speed (m/s)")
                ax.set_title(f"foot mass x{fm:g}, slope {sl:g} rad "
                             f"(pass rate {cell.mean():.2f})")
                for (yi, xi), v in np.ndenumerate(cell):
                    ax.text(xi, yi, "pass" if v > 0.5 else "FAIL",
                            ha="center", va="center", fontsize=9)
                fig.colorbar(im, ax=ax, shrink=0.8)
                pdf.savefig(fig)
                plt.close(fig)
    return path


def report_perturbation(result: dict, path: str,
                        title: str = "push robustness"):
    """result = eval_suites.eval_perturbation(...) output with keys
    `angles` (A,), `forces` (F,), `survival` (A, F, P). Polar plot of the
    maximum survived force per direction, per phase and aggregate
    (eval_perturb.plot_perturb parity)."""
    import matplotlib.pyplot as plt

    angles = np.asarray(result["angles"], dtype=float)
    forces = np.asarray(result["forces"], dtype=float)
    surv = np.asarray(result["survival"]) > 0.5          # (A, F, P)

    # max force survived per (angle, phase)
    idx = np.where(surv, np.arange(len(forces))[None, :, None],
                   -1).max(axis=1)                       # (A, P)
    max_f = np.where(idx >= 0, forces[np.maximum(idx, 0)], 0.0)

    with _pdf(path) as pdf:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="polar")
        mean_f = max_f.mean(axis=-1)
        th = np.concatenate([angles, angles[:1]])
        rr = np.concatenate([mean_f, mean_f[:1]])
        ax.plot(th, rr, "-o")
        ax.fill(th, rr, alpha=0.25)
        ax.set_title(f"{title}: mean max survivable force (N)")
        pdf.savefig(fig)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(7, 4))
        im = ax.imshow(max_f.T, aspect="auto", cmap="viridis",
                       extent=[np.degrees(angles[0]), np.degrees(angles[-1]),
                               0, max_f.shape[1]])
        ax.set_xlabel("push direction (deg)")
        ax.set_ylabel("gait phase index")
        ax.set_title("max survivable force per phase")
        fig.colorbar(im, ax=ax, shrink=0.8, label="N")
        pdf.savefig(fig)
        plt.close(fig)
    return path


def report_compare(result: dict, path: str,
                   labels=("policy A", "policy B")):
    """result = eval_suites.compare_policies(...) output ({'a': (ret, len),
    'b': (ret, len)}). Bar-chart PDF (compare_pols.py parity)."""
    import matplotlib.pyplot as plt

    ra, rb = result["a"], result["b"]
    with _pdf(path) as pdf:
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        for ax, idx, name in ((axes[0], 0, "eval return"),
                              (axes[1], 1, "episode length")):
            vals = [float(ra[idx]), float(rb[idx])]
            ax.bar(labels, vals, color=["tab:blue", "tab:orange"])
            ax.set_title(name)
            for x, v in enumerate(vals):
                ax.text(x, v, f"{v:.1f}", ha="center", va="bottom")
        pdf.savefig(fig)
        plt.close(fig)
    return path
