"""Mechanical CLI flag parity vs the reference.

Scrapes every ``add_argument`` option string from the reference's
``src/python`` modules (AST walk with a small resolver for the shared
parser-builder helpers — ``add_GR_args``/``add_view_flags`` & co. add some
flags only under ``if <param>:`` with constant defaults, and call each
other; ref: utils_wgbs.py:233-247, cview.py:117-142) and asserts the
corresponding command of OUR CLI accepts each flag (scraped from its
``--help`` output). This turns COMPONENTS.md's "flag parity" claim into a
test: silently dropping a reference flag now fails the suite.
"""

import ast
import contextlib
import io
import os
import os.path as op
import re
import warnings

import pytest

REF_PY = "/root/reference/src/python"

# reference module -> our CLI command name (cli/main.py COMMANDS)
MODULE_TO_COMMAND = {
    "vis.py": "vis",
    "view.py": "view",
    "cview.py": "cview",
    "convert.py": "convert",
    "pat_fig.py": "pat_fig",
    "beta_to_blocks.py": "beta_to_blocks",
    "beta_to_table.py": "beta_to_table",
    "beta2bed.py": "beta2bed",
    "beta2bw.py": "beta2bw",
    "beta_cov.py": "beta_cov",
    "beta_stats.py": "beta_stats",
    "beta_to_450k.py": "beta_to_450k",
    "compare_betas.py": "compare_betas",
    "init_genome.py": "init_genome",
    "set_default_ref.py": "set_default_ref",
    "bam2pat.py": "bam2pat",
    "index.py": "index",
    "pat2beta.py": "pat2beta",
    "bed2beta.py": "bed2beta",
    "lbeta2beta.py": "lbeta2beta",
    "mix_pat.py": "mix_pat",
    "merge.py": "merge",
    "mask_pat.py": "mask_pat",
    "segment.py": "segment",
    "homog.py": "homog",
    "find_markers.py": "find_markers",
    "add_cpg_counts.py": "add_cpg_counts",
    "frag_len.py": "frag_len",
    "split_by_allele.py": "split_by_allele",
    "split_by_meth.py": "split_by_meth",
    "test_bimodal.py": "test_bimodal",
    "pat2pairs.py": "pat2pairs",
    "mbias_plot.py": "mbias_plot",
}


def _parse(path):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        return ast.parse(open(path).read())


def _call_flags(node):
    """Option strings of one add_argument call (positional args skipped)."""
    return [a.value for a in node.args
            if isinstance(a, ast.Constant) and isinstance(a.value, str)
            and a.value.startswith("-")]


class _Registry:
    """Per-module ASTs, import maps, and function specs for the resolver."""

    def __init__(self, ref_dir):
        self.trees = {}
        self.imports = {}   # module -> {local name: (module, original name)}
        self.functions = {}  # (module, fn) -> FunctionDef node
        for fname in os.listdir(ref_dir):
            if not fname.endswith(".py"):
                continue
            mod = fname[:-3]
            tree = _parse(op.join(ref_dir, fname))
            self.trees[mod] = tree
            imap = {}
            for node in ast.walk(tree):
                if isinstance(node, ast.ImportFrom) and node.module:
                    for alias in node.names:
                        imap[alias.asname or alias.name] = (node.module,
                                                            alias.name)
            self.imports[mod] = imap
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    self.functions[(mod, node.name)] = node

    def _target(self, mod, name):
        """Resolve a called name in `mod` to a (module, fn) key, following
        one `from X import f` hop."""
        if (mod, name) in self.functions:
            return (mod, name)
        tgt = self.imports.get(mod, {}).get(name)
        if tgt and (tgt[0], tgt[1]) in self.functions:
            return (tgt[0], tgt[1])
        return None

    def _eval_kwargs(self, call, env):
        """Constant / param-name keyword values of a helper call."""
        out = {}
        for kw in call.keywords:
            if kw.arg is None:
                continue
            if isinstance(kw.value, ast.Constant):
                out[kw.arg] = kw.value.value
            elif isinstance(kw.value, ast.Name) and kw.value.id in env:
                out[kw.arg] = env[kw.value.id]
        return out

    def resolve_function(self, key, env, depth=0):
        """Flags added by function `key` called with param env `env`
        (missing params take their constant defaults)."""
        if depth > 4:
            return set()
        node = self.functions[key]
        mod = key[0]
        params = [a.arg for a in node.args.args + node.args.kwonlyargs]
        defaults = {}
        pos = node.args.args
        for a, d in zip(pos[len(pos) - len(node.args.defaults):],
                        node.args.defaults):
            if isinstance(d, ast.Constant):
                defaults[a.arg] = d.value
        for a, d in zip(node.args.kwonlyargs, node.args.kw_defaults):
            if isinstance(d, ast.Constant):
                defaults[a.arg] = d.value
        local_env = dict(defaults)
        local_env.update({k: v for k, v in env.items() if k in params})
        flags = set()

        def walk(body, enabled):
            for stmt in body:
                if (isinstance(stmt, ast.If) and isinstance(stmt.test,
                                                            ast.Name)
                        and stmt.test.id in params):
                    walk(stmt.body,
                         enabled and bool(local_env.get(stmt.test.id, True)))
                    walk(stmt.orelse, enabled)
                    continue
                for sub in ast.walk(stmt):
                    if not isinstance(sub, ast.Call):
                        continue
                    f = sub.func
                    if (isinstance(f, ast.Attribute)
                            and f.attr == "add_argument"):
                        if enabled:
                            flags.update(_call_flags(sub))
                        continue
                    name = f.id if isinstance(f, ast.Name) else None
                    tgt = self._target(mod, name) if name else None
                    if tgt and enabled and tgt != key:
                        flags.update(self.resolve_function(
                            tgt, self._eval_kwargs(sub, local_env),
                            depth + 1))

        walk(node.body, True)
        return flags

    def module_flags(self, module):
        """All option strings a reference module's parser(s) accept: its
        own add_argument calls plus resolved helper-builder calls."""
        mod = module[:-3]
        tree = self.trees[mod]
        flags = set()

        def _internal_reparse(fn):
            """True for functions that build a parser only to re-parse a
            SYNTHESIZED argv (``parse_args(<list>)`` with arguments) — not
            part of the user-facing CLI (e.g. split_by_allele.py:88-95
            re-drives bam2pat internally)."""
            for sub in ast.walk(fn):
                if (isinstance(sub, ast.Call)
                        and isinstance(sub.func, ast.Attribute)
                        and sub.func.attr == "parse_args" and sub.args):
                    return True
            return False

        skip = set()
        for fn in ast.walk(tree):
            if (isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef))
                    and _internal_reparse(fn)):
                skip.update(id(x) for x in ast.walk(fn))
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call) or id(node) in skip:
                continue
            f = node.func
            if isinstance(f, ast.Attribute) and f.attr == "add_argument":
                flags.update(_call_flags(node))
            name = f.id if isinstance(f, ast.Name) else None
            if name:
                tgt = self._target(mod, name)
                # resolving own functions too lets their NESTED imported-
                # helper calls see the right parameter defaults (e.g.
                # cview.add_view_flags -> add_GR_args(bed_file=bed_file)
                # with bed_file defaulting True, cview.py:117-118)
                if tgt:
                    flags.update(self.resolve_function(
                        tgt, self._eval_kwargs(node, {})))
        return flags


@pytest.fixture(scope="module")
def registry():
    return _Registry(REF_PY)


def our_flags(command):
    """Option strings our command's --help lists (argparse renders every
    non-suppressed option in the options section)."""
    from wgbs_tools_tpu.cli.main import COMMANDS

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            COMMANDS[command](["--help"])
        except SystemExit:
            pass
    text = buf.getvalue()
    assert text.strip(), f"{command} --help produced no output"
    return set(re.findall(r"(?<![\w-])(--?[A-Za-z@][\w@-]*)", text))


@pytest.mark.parametrize("module", sorted(MODULE_TO_COMMAND))
def test_reference_flags_accepted(module, registry):
    command = MODULE_TO_COMMAND[module]
    ref = registry.module_flags(module)
    assert ref, f"scraper found no flags in reference {module}"
    ours = our_flags(command)
    missing = sorted(ref - ours)
    assert not missing, (
        f"{command}: reference flags missing from our parser: {missing}")
