"""Citation sweep: every docstring claim of a PARITY.md record must be real.

Twice (round 3: serving.py:76; round 4: ops/pallas/requant.py:13) a
docstring said a measurement was "recorded in PARITY.md §Performance"
when no such record existed — the claim was written before the
measurement and never reconciled.  This test makes that failure class
structural:

- every repo source line mentioning ``PARITY.md`` must be covered by a
  registry entry below (file -> expected citation-line count + regexes
  that must match the PARITY text);
- adding a NEW citation (new file, or a new line in a registered file)
  fails the count check, forcing the author to (a) add a registry regex
  and (b) make it match an actual PARITY record;
- removing/renaming the cited PARITY record fails the regex check.

Quick tier: pure file scanning, no jax.
"""

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

# file (repo-relative) -> (expected number of lines containing "PARITY.md",
#                          regexes that must each match PARITY.md's text)
REGISTRY = {
    # cites the serve_decoder_int8 profile's dominant op and defers its
    # end-to-end A/B to PARITY
    "s2r_tpu/ops/pallas/requant.py": (2, [
        r"clamp_convert_fusion",
        r"Pallas-requant end-to-end A/B",
    ]),
    # cites the headline step's device profile (layout-copy lines) and the
    # W-minor in-step refutation
    "s2r_tpu/ops/pallas/disc_conv.py": (1, [
        r"layout copies",
        r"Pallas W-minor",
    ]),
    # cites the decoder-serving integration numbers
    "s2r_tpu/ops/argmax.py": (1, [r"7\.86 -> 7\.61"]),
    # --help text cites the decoder-argmax accuracy line and the int8
    # conv-class probe
    "s2r_tpu/cli/export.py": (3, [
        r"99\.40% pixel agreement",
        r"1\.72x",
        # --serve-split-concat cites the round-5 same-window serving A/B
        r"7\.62 \| \*\*7\.21\*\*",
    ]),
    # cites the synthetic convergence evidence section
    "s2r_tpu/data/synthetic.py": (1, [
        r"## End-to-end convergence evidence",
    ]),
    # cites the int8 probe lines, the decoder-int8 end-to-end numbers and
    # the round-5 requant-lowering A/B
    "s2r_tpu/io/quant.py": (4, [
        r"int8 feasibility probes",
        r"8\.83 ms/image vs 7\.62",
        r"Pallas-requant end-to-end A/B",
    ]),
    # cites the decoder-argmax serving paragraph and the b1 pad-batch
    # measurement
    "s2r_tpu/io/serving.py": (2, [
        r"99\.40% pixel agreement",
        r"pad_batch_to",
    ]),
    # cites the committed convergence checkpoint / servable-mIoU record
    "tests/test_serving.py": (1, [
        r"test_servable_preserves_trained_miou",
    ]),
    # exp harnesses that state where their numbers are recorded
    "exp/eval_batch.py": (1, [r"eval_fullres 2048x1024 b1"]),
    "exp/serve_bench.py": (1, [r"14\.33", r"10\.72"]),
    "exp/serve_agree.py": (1, [r"0\.023 \(chance\)"]),
    "exp/int8_probe.py": (2, [r"int8 feasibility probes"]),
    "exp/profile_step.py": (1, [r"Per-config device profiles"]),
    "exp/drn_stem_probe.py": (1, [r"drn stem layout probe"]),
    "exp/requant_probe.py": (2, [
        r"clamp_convert_fusion",
        r"Pallas-requant end-to-end A/B",
    ]),
    "exp/async_save_probe.py": (1, [r"34\.4 s"]),
}

_SELF = "tests/test_citations.py"


def _citing_files():
    """repo-relative path -> count of lines containing 'PARITY.md'."""
    counts = {}
    for pattern in ("s2r_tpu/**/*.py", "exp/*.py", "tests/*.py", "*.py"):
        for path in ROOT.glob(pattern):
            rel = path.relative_to(ROOT).as_posix()
            if rel == _SELF:
                continue
            n = sum("PARITY.md" in line
                    for line in path.read_text().splitlines())
            if n:
                counts[rel] = n
    return counts


def test_every_parity_citation_is_registered():
    counts = _citing_files()
    unregistered = sorted(set(counts) - set(REGISTRY))
    assert not unregistered, (
        f"files cite PARITY.md without a registry entry: {unregistered} — "
        "add them to tests/test_citations.py REGISTRY with a regex that "
        "matches the ACTUAL PARITY.md record the citation points at")
    stale = sorted(set(REGISTRY) - set(counts))
    assert not stale, (
        f"registry entries for files that no longer cite PARITY.md: {stale}")
    for rel, (want, _) in REGISTRY.items():
        assert counts[rel] == want, (
            f"{rel}: {counts[rel]} lines cite PARITY.md, registry expects "
            f"{want} — a citation was added or removed; update the registry "
            "AND make sure the cited PARITY record exists")


def test_every_cited_parity_record_exists():
    parity = (ROOT / "PARITY.md").read_text()
    missing = [(rel, rx) for rel, (_, rxs) in REGISTRY.items()
               for rx in rxs if not re.search(rx, parity)]
    assert not missing, (
        f"citations point at PARITY.md records that do not exist: {missing}"
        " — the docstring claims a measurement PARITY.md does not record "
        "(the round-3 serving.py / round-4 requant.py failure class)")
