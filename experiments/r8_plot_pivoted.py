"""Render docs/plots/pivoted_cliff.png: exact QP3 vs RQRCP pivoted-QR
runtime over problem size (measured on one v5e chip,
experiments/r8_rqrcp_bench.jsonl)."""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

SIZES = [512, 1024, 2048, 4096]
EXACT = [2.73, 7.01, 32.5, None]     # ms; 4096 not affordable to measure
RQRCP = [0.74, 1.79, 6.18, 34.5]     # ms; Mosaic selection + slab permute

C_EXACT, C_RQRCP = "#2a78d6", "#eb6834"  # validated categorical slots 1, 2

fig, ax = plt.subplots(figsize=(6.4, 4.2), dpi=150)
fig.patch.set_facecolor("#fcfcfb")
ax.set_facecolor("#fcfcfb")

ax.plot(SIZES[:3], EXACT[:3], color=C_EXACT, lw=2, marker="o", ms=6,
        label="exact QP3 (Businger–Golub)")
ax.plot(SIZES, RQRCP, color=C_RQRCP, lw=2, marker="o", ms=6,
        label="RQRCP (sketch pivoting)")
ax.set_xscale("log", base=2)
ax.set_yscale("log")
ax.set_xticks(SIZES)
ax.set_xticklabels([str(s) for s in SIZES])
ax.set_xlabel("n  (square n×n problem)", color="#52514e")
ax.set_ylabel("runtime, ms", color="#52514e")
ax.set_title("Column-pivoted QR on one TPU v5e chip", color="#0b0b0b")
# selective direct labels (end of each line), text in ink not series color
ax.annotate("32.5 ms", (2048, 32.5), textcoords="offset points",
            xytext=(6, 4), fontsize=9, color="#0b0b0b")
ax.annotate("6.2 ms", (2048, 6.18), textcoords="offset points",
            xytext=(6, -12), fontsize=9, color="#0b0b0b")
ax.grid(True, which="major", color="#e4e3df", lw=0.6)
ax.tick_params(colors="#52514e")
for s in ("top", "right"):
    ax.spines[s].set_visible(False)
for s in ("left", "bottom"):
    ax.spines[s].set_color("#c3c2b7")
ax.legend(frameon=False, loc="upper left", fontsize=9)
fig.tight_layout()
fig.savefig("docs/plots/pivoted_cliff.png")
print("written docs/plots/pivoted_cliff.png")
