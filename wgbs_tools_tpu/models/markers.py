"""find_markers: differentially-methylated region discovery across sample
groups (ref: src/python/find_markers.py, fm_load_params.py, dmb.py).

The screening pipeline per target group: coverage/NA filters, U/M direction
scans with mean + quantile delta thresholds, then t-test / Mann-Whitney /
M-value t-test column statistics. Defaults mirror
supplemental/find_markers_defaults.txt.
"""

import os.path as op

import numpy as np
import pandas as pd

from ..formats.beta import beta2vec
from ..formats.blocks import load_blocks
from ..utils import IllegalArgumentError, eprint, mkdirp, pretty_name

DEFAULTS = dict(
    blocks_path=None, groups_file=None, targets=None, background=None,
    betas=None, min_bp=0, max_bp=10_000_000_000, min_cpg=0,
    max_cpg=10_000_000_000, min_cov=5, na_rate_tg=0.334, na_rate_bg=0.334,
    only_hyper=False, only_hypo=False, delta_means=0.3, delta_quants=0.0,
    tg_quant=0.25, bg_quant=0.025, unmeth_quant_thresh=1.0,
    meth_quant_thresh=0.0, unmeth_mean_thresh=1.0, meth_mean_thresh=0.0,
    out_dir=".", top=None, header=False, verbose=False, chunk_size=150000,
    pval=0.05, test_type="t", sort_by=None, delta_maxmin=-1,
)


class MarkerParams:
    """Layered config: defaults < config file < explicit kwargs
    (ref: fm_load_params.py:14-44)."""

    def __init__(self, config_file=None, **kwargs):
        for k, v in DEFAULTS.items():
            setattr(self, k, v)
        if config_file:
            for k, v in _load_param_file(config_file).items():
                setattr(self, k, v)
        for k, v in kwargs.items():
            if v is None:
                continue
            if isinstance(v, bool) and not v:
                continue
            setattr(self, k, v)
        self.validate()

    def validate(self):
        if self.only_hyper and self.only_hypo:
            raise IllegalArgumentError(
                "at most one of (only_hyper, only_hypo) can be specified")
        for key in ("na_rate_tg", "na_rate_bg", "tg_quant", "bg_quant",
                    "unmeth_quant_thresh", "meth_quant_thresh",
                    "unmeth_mean_thresh", "meth_mean_thresh", "pval"):
            v = float(getattr(self, key))
            if not 0 <= v <= 1:
                raise IllegalArgumentError(f"{key} must be in [0, 1]")
        for key in ("delta_means", "delta_quants", "delta_maxmin"):
            v = float(getattr(self, key))
            if not -1 <= v <= 1:
                raise IllegalArgumentError(f"{key} must be in [-1, 1]")
        if self.test_type not in ("t", "mw", "m_t"):
            raise IllegalArgumentError("test_type must be t, mw or m_t")

    def as_dict(self):
        return {k: getattr(self, k) for k in DEFAULTS}


def _load_param_file(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line or ":" not in line:
                continue
            key, val = line.split(":", 1)
            val = val.strip()
            if val in ("NA", "None", ""):
                val = None
            elif val == "True":
                val = True
            elif val == "False":
                val = False
            elif key.strip() == "targets":
                val = val.split()
            else:
                try:
                    val = int(val)
                except ValueError:
                    try:
                        val = float(val)
                    except ValueError:
                        pass
            out[key.strip()] = val
    return out


def load_groups(groups_file, betas):
    """{group: [beta paths]} from a groups csv (ref: dmb.py:24-80)."""
    gf = pd.read_csv(groups_file, index_col=False, comment="#")
    if "group" not in gf.columns:
        raise IllegalArgumentError('groups file must have a "group" column')
    if "include" in gf.columns:
        gf = gf[gf["include"]]
    gf = gf.rename(columns={gf.columns[0]: "fname"})
    gf = gf[["fname", "group"]].dropna().reset_index(drop=True)
    name2path = {}
    for prefix in gf["fname"]:
        matches = [b for b in betas
                   if op.basename(b) in (prefix + ".beta", prefix + ".lbeta")
                   or pretty_name(b) == prefix]
        if not matches:
            raise IllegalArgumentError(f"no beta file for prefix {prefix}")
        name2path[prefix] = matches[0]
    gf["full_path"] = gf["fname"].map(name2path)
    return gf


def build_block_table(blocks, gf, min_cov):
    """blocks x samples methylation matrix (NaN below min_cov)."""
    from ..cli.cmd_beta import reduce_beta_to_blocks

    table = {}
    for _, row in gf.drop_duplicates("fname").iterrows():
        reduced = reduce_beta_to_blocks(row["full_path"], blocks)
        table[row["fname"]] = beta2vec(reduced, min_cov=min_cov)
    df = pd.DataFrame(
        {
            "chr": blocks["chr"], "start": blocks["start"],
            "end": blocks["end"], "startCpG": blocks["startCpG"],
            "endCpG": blocks["endCpG"],
        }
    )
    for k, v in table.items():
        df[k] = v
    return df


def _find_x_markers(tf, tg_names, bg_names, p, tg_quant, bg_quant):
    """Direction scan (ref: find_markers.py:335-369). tg = hypo group."""
    tfX = tf.copy()
    tfX["delta_maxmin"] = (tfX[bg_names].min(axis=1)
                           - tfX[tg_names].max(axis=1))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        tfX["tg_mean"] = np.nanmean(tfX[tg_names], axis=1)
        tfX["bg_mean"] = np.nanmean(tfX[bg_names], axis=1)
    tfX["delta_means"] = tfX["bg_mean"] - tfX["tg_mean"]
    keep = (
        (tfX["tg_mean"] <= p.unmeth_mean_thresh)
        & (tfX["bg_mean"] >= p.meth_mean_thresh)
        & (tfX["delta_means"] >= p.delta_means)
        & (tfX["delta_maxmin"] >= p.delta_maxmin)
    )
    tfX = tfX.loc[keep].reset_index(drop=True)
    if tfX.empty:
        return tfX
    with np.errstate(all="ignore"):
        tfX["tg_quant"] = np.nanquantile(tfX[tg_names], 1 - tg_quant, axis=1)
        tfX["bg_quant"] = np.nanquantile(tfX[bg_names], bg_quant, axis=1)
    tfX["delta_quants"] = tfX["bg_quant"] - tfX["tg_quant"]
    keep = (
        (tfX["tg_quant"] <= p.unmeth_quant_thresh)
        & (tfX["bg_quant"] >= p.meth_quant_thresh)
        & (tfX["delta_quants"] >= p.delta_quants)
    )
    return tfX.loc[keep].reset_index(drop=True)


def _add_tests(tf, tg_names, bg_names, p):
    """t-test / MW / M-value t-test columns (ref: find_markers.py:203-316)."""
    from scipy.stats import mannwhitneyu, ttest_1samp, ttest_ind

    if tf.empty:
        return tf

    def _tt(a, b, equal_var=True):
        if len(tg_names) == len(bg_names) == 1:
            return np.full(tf.shape[0], np.nan)
        if a.shape[1] == 1:
            return ttest_1samp(b, a.values, axis=1, nan_policy="omit").pvalue
        if b.shape[1] == 1:
            return ttest_1samp(a, b.values, axis=1, nan_policy="omit").pvalue
        return ttest_ind(a, b, axis=1, nan_policy="omit",
                         equal_var=equal_var).pvalue

    tf = tf.copy()
    tf["ttest"] = _tt(tf[tg_names], tf[bg_names])
    if p.test_type == "t":
        tf = tf[~(tf["ttest"] > p.pval)].reset_index(drop=True)
        if tf.empty:
            return tf

    if len(tg_names) == len(bg_names) == 1:
        tf["mw_test"] = np.nan
    else:
        try:
            r = mannwhitneyu(tf[tg_names], tf[bg_names], axis=1,
                             nan_policy="omit", alternative="two-sided")
            tf["mw_test"] = np.asarray(r.pvalue)
        except Exception:
            tf["mw_test"] = np.nan
    if p.test_type == "mw":
        tf = tf[~(tf["mw_test"] > p.pval)].reset_index(drop=True)
        if tf.empty:
            return tf

    tg_m = np.log2(tf[tg_names].clip(1e-4, 1 - 1e-4)
                   / (1 - tf[tg_names].clip(1e-4, 1 - 1e-4)))
    bg_m = np.log2(tf[bg_names].clip(1e-4, 1 - 1e-4)
                   / (1 - tf[bg_names].clip(1e-4, 1 - 1e-4)))
    tf["mvalue_ttest"] = _tt(tg_m, bg_m, equal_var=False)
    if p.test_type == "m_t":
        tf = tf[~(tf["mvalue_ttest"] > p.pval)].reset_index(drop=True)
    return tf


def find_markers(params: MarkerParams, betas, blocks_path=None,
                 groups_file=None):
    """Run the full marker scan; returns {target: DataFrame} and writes
    Markers.<group>.bed + params.txt under out_dir."""
    p = params
    blocks_path = blocks_path or p.blocks_path
    groups_file = groups_file or p.groups_file
    if not blocks_path or not groups_file:
        raise IllegalArgumentError("blocks_path and groups_file are required")

    gf = load_groups(groups_file, betas)
    groups = sorted(gf["group"].unique())
    targets = p.targets if p.targets else groups
    background = p.background if p.background else groups

    blocks = load_blocks(blocks_path)
    lencpg = blocks["endCpG"] - blocks["startCpG"]
    lenbp = blocks["end"] - blocks["start"]
    keep = (
        (blocks["startCpG"] >= 0)
        & (lencpg >= p.min_cpg) & (lencpg <= p.max_cpg)
        & (lenbp >= p.min_bp) & (lenbp <= p.max_bp)
    )
    blocks = {k: v[keep] for k, v in blocks.items()}

    mkdirp(p.out_dir)
    _dump_params(p, betas)

    df = build_block_table(blocks, gf, p.min_cov)
    results = {}
    for target in targets:
        tg_names = list(gf[gf["group"] == target]["fname"].values)
        bg_names = [
            s for s in gf[gf["group"].isin(background)]["fname"].unique()
            if s not in tg_names
        ]
        if not bg_names or not tg_names:
            continue
        tf = df.copy()
        keep_tg = (tf[tg_names].notna().sum(axis=1) / len(tg_names)
                   >= 1 - p.na_rate_tg)
        keep_bg = (tf[bg_names].notna().sum(axis=1) / len(bg_names)
                   >= 1 - p.na_rate_bg)
        tf = tf.loc[keep_tg & keep_bg].reset_index(drop=True)

        frames = []
        if not p.only_hyper:  # U (hypo) markers
            tfU = _find_x_markers(tf, tg_names, bg_names, p, p.tg_quant,
                                  p.bg_quant)
            if not tfU.empty:
                tfU["direction"] = "U"
                frames.append(tfU)
        if not p.only_hypo:  # M (hyper) markers: swap roles
            tfM = _find_x_markers(tf, bg_names, tg_names, p, p.bg_quant,
                                  p.tg_quant)
            if not tfM.empty:
                tfM["tg_mean"], tfM["bg_mean"] = (tfM["bg_mean"].copy(),
                                                  tfM["tg_mean"].copy())
                tfM["direction"] = "M"
                frames.append(tfM)
        tf = (pd.concat(frames).reset_index(drop=True)
              if frames else pd.DataFrame())
        tf = _add_tests(tf, tg_names, bg_names, p)
        results[target] = tf
        _dump_group(tf, target, tg_names, bg_names, p)
    return results


def _dump_group(tf, group, tg_names, bg_names, p):
    eprint(f"[wt fm] {group}: {tf.shape[0]:,} markers")
    outpath = op.join(p.out_dir, f"Markers.{group}.bed")
    cols = ["chr", "start", "end", "startCpG", "endCpG", "target", "region",
            "lenCpG", "bp", "tg_mean", "bg_mean", "delta_means",
            "delta_quants", "delta_maxmin", "ttest", "mw_test",
            "mvalue_ttest", "direction"]
    if tf.empty:
        out = pd.DataFrame(columns=cols)
    else:
        out = tf.copy()
        if p.sort_by:
            out.sort_values(by=p.sort_by, ascending=False, inplace=True)
        if p.top:
            out = out.head(int(p.top)).copy()
        out["target"] = group
        out["lenCpG"] = (out["endCpG"] - out["startCpG"]).astype(str) + "CpGs"
        out["bp"] = (out["end"] - out["start"]).astype(str) + "bp"
        out["region"] = (out["chr"].astype(str) + ":" + out["start"].astype(str)
                         + "-" + out["end"].astype(str))
        out = out[cols]
    out = out.rename(columns={"chr": "#chr"})
    mode = "w"
    if p.header:
        with open(outpath, "w") as f:
            for s in sorted(tg_names):
                f.write(f"#> {s}\n")
            for s in sorted(bg_names):
                f.write(f"#< {s}\n")
        mode = "a"
    out.to_csv(outpath, index=None, sep="\t", mode=mode, header=True,
               na_rep="NA", float_format="%.3g")


def _dump_params(p, betas):
    with open(op.join(p.out_dir, "params.txt"), "w") as f:
        for key, val in p.as_dict().items():
            if key == "betas":
                val = " ".join(betas)
            elif key == "targets" and val is not None:
                val = " ".join(val)
            f.write(f"{key}:{val}\n")
