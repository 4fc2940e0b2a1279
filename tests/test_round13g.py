"""Round-13 deferred-bank batch 4 replays: the deterministic Poisson
bootstrap CI and the code-switch screen."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from billing_data_loader_spark.operators.profiling import (
    _BOOT_B,
    _BOOT_SALT,
    _BOOT_T,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _poisson_k(u: int) -> int:
    for k, t in enumerate(_BOOT_T):
        if u < t:
            return k
    return 7


class TestBootstrapCi:
    def test_python_replay(self, spark):
        spend = Counter()
        for r in (
            load(spark, SF_DIR, "orders")
            .select("o_custkey", "o_totalprice")
            .collect()
        ):
            spend[r["o_custkey"]] += math.floor(
                r["o_totalprice"] * 100 + 0.5
            )
        cust = [
            (r["c_custkey"], spend.get(r["c_custkey"], 0))
            for r in load(spark, SF_DIR, "customer")
            .select("c_custkey")
            .collect()
        ]
        reps = []
        for b in range(_BOOT_B):
            sk = skc = 0
            for c, cents in cust:
                h = hashlib.md5(
                    f"{c}{_BOOT_SALT}{b}".encode()
                ).hexdigest()[:12]
                u = int(h, 16) % 1_000_000
                k = _poisson_k(u)
                sk += k
                skc += k * cents
            reps.append((skc * 1_000_000 // sk, b, sk, skc))
        reps.sort()
        lo = reps[1]  # rank 2
        hi = reps[_BOOT_B - 2]  # rank B-1
        got = catalog()["ext_bootstrap_ci_mean"].fn(spark, SF_DIR).collect()
        assert len(got) == 1
        g = got[0]
        assert g["n"] == len(cust)
        assert g["n_replicates"] == _BOOT_B
        gs = sum(c for _, c in cust)
        assert abs(g["point_mean_cents"] - gs / len(cust)) < 1e-9
        assert abs(g["ci_lo_cents"] - lo[3] / lo[2]) < 1e-9
        assert abs(g["ci_hi_cents"] - hi[3] / hi[2]) < 1e-9
        # the CI must bracket the point estimate and be ordered
        assert g["ci_lo_cents"] <= g["point_mean_cents"] <= g["ci_hi_cents"]

    def test_poisson_thresholds_are_cdf(self):
        e = math.exp(-1)
        cdf = 0.0
        for k, t in enumerate(_BOOT_T):
            cdf += e / math.factorial(k)
            assert t == round(cdf * 1_000_000)


class TestCodeSwitch:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "text")
            .collect()
        )
        tok_counts = defaultdict(Counter)
        for r in rows:
            for t in r["text"].split(" "):
                tok_counts[r["lang"]][t] += 1
        sig = defaultdict(set)
        for lang, cnts in tok_counts.items():
            top = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
            for t, _ in top:
                sig[lang].add(t)
        got = {
            r["doc_id"]: r
            for r in catalog()["ext_code_switch_detect"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {r["doc_id"] for r in rows}
        n_mixed = 0
        for r in rows:
            toks = set(r["text"].split(" "))
            own = sum(1 for t in toks if t in sig[r["lang"]])
            frgn = sum(
                1
                for t in toks
                if t not in sig[r["lang"]]
                and any(
                    t in sig[lg] for lg in sig if lg != r["lang"]
                )
            )
            g = got[r["doc_id"]]
            assert g["lang"] == r["lang"]
            assert g["n_tok_distinct"] == len(toks)
            assert g["n_own_sig"] == own
            assert g["n_foreign_sig"] == frgn
            assert abs(g["foreign_frac"] - frgn / len(toks)) < 1e-15
            assert g["mixed_flag"] == (5 * frgn >= len(toks))
            n_mixed += g["mixed_flag"]
        # the fixture's shared-ASCII token pool guarantees SOME mixing
        # signal; the screen must not be all-or-nothing
        assert 0 < n_mixed < len(got)
