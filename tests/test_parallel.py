"""Distributed kernel tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkir_tpu.interp import InterpConfig, TpuInterpreter, HALT_EXIT
from zkir_tpu.ops import merkle
from zkir_tpu.ops.ntt import ntt
from zkir_tpu.parallel import (
    dist_merkle_root,
    dist_ntt_natural,
    make_mesh,
    sharded_interpreter_state,
)
from zkir_tpu.spec import Instruction, Op, Program
from zkir_tpu.spec.field import M31_PRIME

RNG = np.random.default_rng(55)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh2():
    return make_mesh(2)


class TestDistNTT:
    @pytest.mark.parametrize("log_n", [8, 10, 12])
    def test_matches_single_chip(self, mesh8, log_n):
        n = 1 << log_n
        re = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        im = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        want_r, want_i = ntt(re, im, log_n)
        got_r, got_i = dist_ntt_natural(re, im, mesh8, log_n)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    def test_two_device_mesh(self, mesh2):
        log_n = 8
        n = 1 << log_n
        re = jnp.asarray(RNG.integers(0, M31_PRIME, n, dtype=np.uint32))
        im = jnp.zeros(n, dtype=jnp.uint32)
        want_r, _ = ntt(re, im, log_n)
        got_r, _ = dist_ntt_natural(re, im, mesh2, log_n)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))


class TestDistMerkle:
    def test_matches_single_chip(self, mesh8):
        rows = jnp.asarray(
            RNG.integers(0, M31_PRIME, size=(64, 6), dtype=np.uint32))
        want = merkle.root(merkle.build_tree(merkle.hash_rows(rows)))
        got = np.asarray(dist_merkle_root(rows, mesh8))
        np.testing.assert_array_equal(got, want)

    def test_two_devices(self, mesh2):
        rows = jnp.asarray(
            RNG.integers(0, M31_PRIME, size=(16, 3), dtype=np.uint32))
        want = merkle.root(merkle.build_tree(merkle.hash_rows(rows)))
        got = np.asarray(dist_merkle_root(rows, mesh2))
        np.testing.assert_array_equal(got, want)


class TestShardedTraceGen:
    def test_lane_sharded_execution(self, mesh8):
        import pathlib
        src = (pathlib.Path(__file__).resolve().parent.parent
               / "examples" / "fibonacci.zkasm").read_text()
        from zkir_tpu.asm import assemble
        program = assemble(src)
        interp = TpuInterpreter(program, InterpConfig(lanes=8, chunk=64))
        state = interp.init_state([[n] for n in range(8)])
        state = sharded_interpreter_state(state, mesh8)
        # Run chunks manually on the sharded state.
        import jax.numpy as jnp2
        n_words = jnp2.int32(interp.n_words)
        for _ in range(4):
            state, _ = interp._chunk_fn(interp.code, n_words, state)
        halted = np.asarray(state.halted)
        outputs = (np.asarray(state.outputs_lo).astype(np.uint64)
                   | (np.asarray(state.outputs_hi).astype(np.uint64)
                      << np.uint64(32)))
        expect = [0, 1, 1, 2, 3, 5, 8, 13]
        assert (halted == HALT_EXIT).all()
        for lane in range(8):
            assert int(outputs[lane, 0]) == expect[lane]


class TestProveStepSharded:
    def test_one_step(self, mesh8):
        from zkir_tpu.parallel import prove_step_sharded
        program = Program.from_instructions([
            Instruction(Op.ADDI, rd=1, rs1=0, imm=7),
            Instruction(Op.ADD, rd=2, rs1=2, rs2=1),
            Instruction(Op.JAL, rd=0, imm=-4),
        ])
        interp = TpuInterpreter(program, InterpConfig(lanes=8, chunk=32))
        state = interp.init_state([[] for _ in range(8)])
        state = sharded_interpreter_state(state, mesh8)
        new_state, root = prove_step_sharded(interp, state, mesh8, log_n=10)
        assert np.asarray(root).shape == (8,)
        assert np.asarray(new_state.cycles).min() == 32


class TestDistLde:
    def test_matches_single_chip(self, mesh8):
        from zkir_tpu.ops.ntt import lde
        from zkir_tpu.parallel import dist_lde
        import jax.numpy as jnp
        log_n, log_blowup = 6, 2
        cols = 16  # divisible by 8 devices
        r = jnp.asarray(RNG.integers(0, M31_PRIME, (cols, 1 << log_n),
                                     dtype=np.uint32))
        i = jnp.zeros_like(r)
        want_r, want_i = lde(r, i, log_n, log_blowup)
        got_r, got_i = dist_lde(r, i, mesh8, log_n, log_blowup)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))

    def test_with_coset_shift(self, mesh2):
        from zkir_tpu.ops.ntt import _find_generator, lde
        from zkir_tpu.parallel import dist_lde
        import jax.numpy as jnp
        shift = _find_generator()
        log_n, log_blowup = 5, 1
        r = jnp.asarray(RNG.integers(0, M31_PRIME, (4, 1 << log_n),
                                     dtype=np.uint32))
        i = jnp.zeros_like(r)
        want_r, _ = lde(r, i, log_n, log_blowup, shift=shift)
        got_r, _ = dist_lde(r, i, mesh2, log_n, log_blowup, shift=shift)
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
