"""Checkpoint/resume for long trace generations.

The reference has no checkpointing in the resume sense (SURVEY §5 — its
"checkpoint" is a range-check flush).  At TPU scale a 2^24-row trace
generation is a long-running sharded job; this module makes it restartable
by persisting the complete ``MachineState`` (plus config identity) to a
single ``.npz`` artifact between scan chunks.

Usage:
    save_state("ckpt.npz", interp, state)
    interp, state = load_state("ckpt.npz", program)
    # continue: interp._chunk_fn(interp.code, n_words, state)
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..spec.program import Program
from .columnar import InterpConfig, MachineState, TpuInterpreter


def save_state(path: str, interp: TpuInterpreter, state: MachineState) -> None:
    arrays = {name: np.asarray(value)
              for name, value in zip(MachineState._fields, state)}
    meta = {
        "config": dataclasses.asdict(interp.config),
        "program": interp.program.to_bytes().hex(),
    }
    np.savez_compressed(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)


def load_state(path: str) -> Tuple[TpuInterpreter, MachineState]:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    program = Program.from_bytes(bytes.fromhex(meta["program"]))
    config = InterpConfig(**meta["config"])
    interp = TpuInterpreter(program, config)
    state = MachineState(**{
        name: jnp.asarray(data[name]) for name in MachineState._fields
    })
    return interp, state
