"""FRI soundness budget and proof-of-work grinding."""

import numpy as np
import pytest

from zkir_tpu.prover import Challenger, FriConfig, fri_prove, fri_verify
from zkir_tpu.ops.ntt import ntt
from zkir_tpu.spec.field import M31_PRIME


def _low_degree_evals(log_n, log_blowup, seed=0):
    """Evaluations of a random degree < 2^(log_n - log_blowup) poly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    n = 1 << log_n
    deg = 1 << (log_n - log_blowup)
    cr = np.zeros(n, dtype=np.uint32)
    ci = np.zeros(n, dtype=np.uint32)
    cr[:deg] = rng.integers(0, M31_PRIME, deg, dtype=np.uint32)
    ci[:deg] = rng.integers(0, M31_PRIME, deg, dtype=np.uint32)
    return ntt(jnp.asarray(cr), jnp.asarray(ci), log_n)


class TestSoundnessBudget:
    def test_default_config_meets_80_bits(self):
        cfg = FriConfig()
        assert cfg.num_queries * cfg.log_blowup + cfg.grinding_bits >= 80

    def test_weak_config_rejected(self):
        with pytest.raises(ValueError, match="soundness budget"):
            FriConfig(log_blowup=2, num_queries=8, grinding_bits=0)

    def test_weak_config_allowed_when_opted_out(self):
        FriConfig(log_blowup=2, num_queries=8, grinding_bits=0,
                  min_security=0)

    def test_custom_target_enforced(self):
        with pytest.raises(ValueError):
            FriConfig(log_blowup=2, num_queries=40, grinding_bits=16,
                      min_security=100)
        FriConfig(log_blowup=2, num_queries=48, grinding_bits=16,
                  min_security=100)

    def test_security_bits_formula(self):
        cfg = FriConfig(log_blowup=2, num_queries=32, grinding_bits=16)
        # FRI phase: 32*2+16 = 80; QM31 ceiling at 2^24 rows, 512 terms:
        # 124 - 24 - 9 = 91 — the query phase is the binding term, so the
        # north-star scale now meets the 80-bit floor end to end (the
        # round-3 CM31 draws capped this at 29 bits).
        assert cfg.security_bits(log_n=24, n_terms=512) == 80
        # A pathological term count exposes the field ceiling.
        assert cfg.security_bits(log_n=30, n_terms=1 << 60) == 34
        cfg2 = FriConfig(log_blowup=2, num_queries=28, grinding_bits=0,
                         min_security=0)
        assert cfg2.security_bits(log_n=4, n_terms=4) == 56


class TestGrinding:
    CFG = FriConfig(log_blowup=2, log_final=3, num_queries=4,
                    grinding_bits=6, min_security=0)

    def test_grind_check_pow_roundtrip(self):
        a, b = Challenger(), Challenger()
        for v in (3, 1, 4, 1, 5):
            a.observe(v)
            b.observe(v)
        nonce = a.grind(6)
        assert b.check_pow(nonce, 6)
        # both transcripts continue in the same state
        assert a.sample() == b.sample()

    def test_wrong_nonce_rejected(self):
        a, b = Challenger(), Challenger()
        a.observe(7)
        b.observe(7)
        nonce = a.grind(8)
        assert not b.check_pow(nonce + 1, 8)

    def test_proof_carries_pow_and_tamper_rejected(self):
        re, im = _low_degree_evals(8, 2)
        import jax.numpy as jnp
        vals = (re, im, jnp.zeros_like(re), jnp.zeros_like(im))
        proof = fri_prove(vals, 8, Challenger(), self.CFG)
        assert "pow_nonce" in proof
        assert fri_verify(proof, Challenger())
        bad = dict(proof)
        bad["pow_nonce"] = proof["pow_nonce"] + 1
        assert not fri_verify(bad, Challenger())

    def test_zero_grinding_is_noop(self):
        c = Challenger()
        c.observe(1)
        assert c.grind(0) == 0
        d = Challenger()
        d.observe(1)
        assert d.check_pow(0, 0)
        assert c.sample() == d.sample()
