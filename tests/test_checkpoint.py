"""Checkpoint/resume of interpreter state mid-run."""

import pathlib

import jax.numpy as jnp
import numpy as np

from zkir_tpu.asm import assemble
from zkir_tpu.interp import InterpConfig, TpuInterpreter, HALT_EXIT
from zkir_tpu.interp.checkpoint import load_state, save_state

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    program = assemble((EXAMPLES / "fibonacci.zkasm").read_text())
    config = InterpConfig(lanes=4, chunk=16, low_bytes=1 << 14,
                          stack_bytes=1 << 12)

    # Uninterrupted run.
    interp_a = TpuInterpreter(program, config)
    full = interp_a.run([[10], [15], [20], [25]])

    # Run a few chunks, checkpoint to disk, reload, continue.
    interp_b = TpuInterpreter(program, config)
    state = interp_b.init_state([[10], [15], [20], [25]])
    n_words = jnp.int32(interp_b.n_words)
    for _ in range(2):
        state, _ = interp_b._chunk_fn(interp_b.code, n_words, state)
    ckpt = tmp_path / "ckpt.npz"
    save_state(str(ckpt), interp_b, state)

    interp_c, state_c = load_state(str(ckpt))
    assert interp_c.config == config
    n_words_c = jnp.int32(interp_c.n_words)
    while not np.all(np.asarray(state_c.halted) != 0):
        state_c, _ = interp_c._chunk_fn(interp_c.code, n_words_c, state_c)

    assert np.array_equal(np.asarray(state_c.cycles), full["cycles"])
    assert np.array_equal(np.asarray(state_c.halted), full["halted"])
    regs = (np.asarray(state_c.regs_lo).astype(np.uint64)
            | (np.asarray(state_c.regs_hi).astype(np.uint64) << np.uint64(32)))
    assert np.array_equal(regs, full["regs"])
    out_pos = np.asarray(state_c.out_pos)
    outputs = (np.asarray(state_c.outputs_lo).astype(np.uint64)
               | (np.asarray(state_c.outputs_hi).astype(np.uint64)
                  << np.uint64(32)))
    for lane in range(4):
        assert list(outputs[lane, :out_pos[lane]]) == \
            [int(x) for x in full["outputs"][lane]]
    assert (np.asarray(state_c.halted) == HALT_EXIT).all()
