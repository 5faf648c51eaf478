"""Tokenizer for ZK-IR v3.4 assembly.

Parity target: reference ``zkir-assembler/src/lexer.rs`` — the same token
classes (identifier, register, decimal/hex/binary numbers, ``.directive``,
punctuation) with ``#`` comments and maximal-munch word classification
(a word is a Register token iff it is ``r0``-``r15`` or one of the
assembler's alias names; otherwise an Identifier).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

from ..spec.registers import REG_ALIASES


@dataclass(frozen=True)
class Token:
    kind: str  # ident | reg | num | comma | colon | lparen | rparen | directive
    text: str
    value: int = 0


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<hex>0x[0-9a-fA-F]+)
  | (?P<bin>0b[01]+)
  | (?P<num>-?[0-9]+)
  | (?P<word>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<directive>\.[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<comma>,)
  | (?P<colon>:)
  | (?P<lparen>\()
  | (?P<rparen>\))
    """,
    re.VERBOSE,
)


class LexError(ValueError):
    pass


def tokenize(line: str) -> List[Token]:
    tokens: List[Token] = []
    pos = 0
    n = len(line)
    while pos < n:
        m = _TOKEN_RE.match(line, pos)
        if m is None:
            raise LexError(f"invalid token at position {pos}: {line[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "hex":
            tokens.append(Token("num", text, int(text, 16)))
        elif kind == "bin":
            tokens.append(Token("num", text, int(text, 2)))
        elif kind == "num":
            tokens.append(Token("num", text, int(text)))
        elif kind == "word":
            lowered = text.lower()
            if lowered in REG_ALIASES:
                tokens.append(Token("reg", text))
            else:
                tokens.append(Token("ident", text))
        elif kind == "directive":
            tokens.append(Token("directive", text[1:]))
        else:
            tokens.append(Token(kind, text))
    return tokens
