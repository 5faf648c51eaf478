"""Malformed-input handling in the assembler.

Port of the reference suite `/root/reference/zkir-assembler/tests/
malformed_input.rs` (41 tests), one test per reference test, same
inputs and same accept/reject outcomes.  Error-behavior notes from the
reference (e.g. `0XFF` is not hex because the lexer only knows the
lowercase prefix, malformed_input.rs:352-360) are verified to hold here
too.
"""

import pytest

from zkir_tpu.asm.assembler import assemble, AssemblerError


def rejects(src: str) -> AssemblerError:
    with pytest.raises(AssemblerError) as ei:
        assemble(src)
    return ei.value


class TestInvalidInstruction:
    def test_unknown_instruction(self):
        # malformed_input.rs:12-22 — error carries the bad mnemonic
        err = rejects("foobar r1, r2, r3")
        assert "foobar" in str(err)

    def test_instruction_typo(self):
        rejects("addd r1, r2, r3")

    def test_empty_instruction_line(self):
        # blank lines are fine (malformed_input.rs:31-41)
        assemble("\n\n        ecall\n\n")


class TestInvalidOperandCount:
    def test_r_type_missing_operands(self):
        rejects("add r1, r2")

    def test_r_type_extra_operands(self):
        rejects("add r1, r2, r3, r4")

    def test_i_type_missing_immediate(self):
        rejects("addi r1, r2")

    def test_system_with_operands(self):
        rejects("ecall r1")


class TestInvalidRegister:
    def test_invalid_register_number(self):
        rejects("add r16, r2, r3")

    def test_invalid_register_name(self):
        rejects("add x0, r2, r3")

    def test_typo_in_register(self):
        rejects("add rr1, r2, r3")

    def test_negative_register(self):
        rejects("add r-1, r2, r3")


class TestInvalidImmediate:
    def test_non_numeric_immediate(self):
        rejects("addi r1, r2, abc")

    def test_floating_point_immediate(self):
        rejects("addi r1, r2, 3.14")

    def test_empty_immediate(self):
        rejects("addi r1, r2,")


class TestInvalidLabel:
    def test_duplicate_label(self):
        rejects("label:\n    add r1, r2, r3\nlabel:\n    ecall\n")

    def test_label_starting_with_number(self):
        rejects("123label:\n    ecall\n")

    def test_empty_label(self):
        rejects(":\n    ecall\n")


class TestInvalidDirective:
    def test_unknown_config_key(self):
        rejects(".config unknown_key 100\n    ecall\n")

    def test_config_invalid_limb_bits_low(self):
        rejects(".config limb_bits 5\n    ecall\n")

    def test_config_invalid_limb_bits_high(self):
        rejects(".config limb_bits 35\n    ecall\n")

    def test_config_missing_value(self):
        rejects(".config limb_bits\n    ecall\n")

    def test_config_non_numeric_value(self):
        rejects(".config limb_bits twenty\n    ecall\n")


class TestSyntaxErrors:
    def test_missing_comma(self):
        rejects("add r1 r2, r3")

    def test_extra_comma(self):
        rejects("add r1,, r2, r3")

    def test_load_missing_parenthesis(self):
        rejects("lw r1, 0 r2")

    def test_load_unmatched_parenthesis(self):
        rejects("lw r1, 0(r2")

    def test_load_wrong_parenthesis_order(self):
        rejects("lw r1, 0)r2(")


class TestCommentEdgeCases:
    def test_comment_only_line(self):
        assemble("    # This is just a comment\n    ecall\n")

    def test_inline_comment_with_hash(self):
        assemble("    add r1, r2, r3 # comment with # hash\n    ecall\n")

    def test_instruction_in_comment(self):
        # the commented-out add must be ignored (malformed_input.rs:283-295)
        program = assemble("    # add r1, r2, r3\n    ecall\n")
        assert len(program.code) == 1


class TestWhitespaceEdgeCases:
    def test_tabs_and_spaces(self):
        assemble("\t  add \t r1 ,\t r2 , r3  \t")

    def test_many_blank_lines(self):
        assemble("\n\n\n\n        ecall\n\n\n\n")


class TestCaseSensitivity:
    def test_uppercase_instruction(self):
        assemble("ADD r1, r2, r3")

    def test_mixed_case_instruction(self):
        assemble("AdD r1, r2, r3")

    def test_uppercase_register(self):
        # reference documents "whatever happens" (malformed_input.rs:335-343);
        # both it and this assembler accept uppercase register names
        assemble("add R1, R2, R3")


class TestNumberFormats:
    def test_hex_immediate(self):
        assemble("addi r1, r2, 0xFF")

    def test_uppercase_hex(self):
        # lowercase-only 0x prefix, like the reference lexer
        # (malformed_input.rs:352-360)
        rejects("addi r1, r2, 0XFF")

    def test_binary_immediate(self):
        assemble("addi r1, r2, 0b1010")

    def test_invalid_hex(self):
        rejects("addi r1, r2, 0xGG")


class TestErrorMessageQuality:
    def test_error_includes_line_number(self):
        err = rejects("\n    add r1, r2, r3\n    foobar\n    ecall\n")
        assert "3" in str(err) or "line" in str(err)

    def test_error_includes_instruction(self):
        err = rejects("badinstr r1, r2, r3")
        assert "badinstr" in str(err)


class TestErrorMessageTextParity:
    """Exact display-string parity with the reference's error enums.

    Format strings: `zkir-assembler/src/error.rs:8-62` (one assert per
    variant the assembler can reach), message text from each raising
    site in `assembler.rs`/`parser.rs`; token text uses the reference
    tokens' Rust Debug rendering (e.g. ``Identifier("x")``), which the
    reference interpolates via ``{:?}`` (assembler.rs:504-534)."""

    def test_invalid_instruction_text(self):
        # error.rs:15-16 + assembler.rs:318-321
        err = rejects("foobar r1, r2, r3")
        assert str(err) == "Invalid instruction at line 1: foobar"
        assert err.kind == "InvalidInstruction"

    def test_syntax_error_r_type_operands(self):
        # assembler.rs:343-346
        err = rejects("add r1, r2")
        assert str(err) == ("Syntax error at line 1: "
                            "R-type requires 3 operands: rd, rs1, rs2")

    def test_syntax_error_i_type_operands(self):
        err = rejects("addi r1, r2")
        assert str(err) == ("Syntax error at line 1: "
                            "I-type requires 3 operands: rd, rs1, imm")

    def test_syntax_error_shift_operands(self):
        # assembler.rs:385-388 — "shamt", not "imm"
        err = rejects("slli r1, r2")
        assert str(err) == ("Syntax error at line 1: "
                            "Shift requires 3 operands: rd, rs1, shamt")

    def test_syntax_error_load_format(self):
        err = rejects("lw r1, 0 r2")
        assert str(err) == ("Syntax error at line 1: "
                            "Load requires format: rd, offset(rs1)")

    def test_syntax_error_store_format(self):
        err = rejects("sw r1, 0")
        assert str(err) == ("Syntax error at line 1: "
                            "Store requires format: rs2, offset(rs1)")

    def test_syntax_error_branch_operands(self):
        err = rejects("beq r1, r2")
        assert str(err) == ("Syntax error at line 1: "
                            "Branch requires 3 operands: rs1, rs2, offset")

    def test_syntax_error_jal_operands(self):
        err = rejects("jal r1")
        assert str(err) == ("Syntax error at line 1: "
                            "JAL requires 2 operands: rd, offset")

    def test_syntax_error_jalr_operands(self):
        # assembler.rs:450-453 — "offset", unlike I-type's "imm"
        err = rejects("jalr r1, r2")
        assert str(err) == ("Syntax error at line 1: "
                            "JALR requires 3 operands: rd, rs1, offset")

    def test_syntax_error_no_operands(self):
        err = rejects("ecall r1")
        assert str(err) == ("Syntax error at line 1: "
                            "Instruction takes no operands")

    def test_syntax_error_empty_instruction(self):
        err = rejects("loop: ,")
        assert str(err).startswith("Syntax error at line 1: ")

    def test_syntax_error_expected_register_token_debug(self):
        # assembler.rs:504-507 interpolates the token's Debug form; r99
        # lexes as an Identifier in both lexers (longest match).
        err = rejects("add r99, r2, r3")
        assert str(err) == ('Syntax error at line 1: '
                            'Expected register, got Identifier("r99")')

    def test_syntax_error_expected_comma_token_debug(self):
        # 5 operand tokens (passing the count check) with a register
        # where the first comma belongs
        err = rejects("add r1 r2 r3, r5")
        assert str(err) == ('Syntax error at line 1: '
                            'Expected comma, got Register("r2")')

    def test_syntax_error_expected_number_token_debug(self):
        err = rejects("addi r1, r2, abc")
        assert str(err) == ('Syntax error at line 1: '
                            'Expected number, got Identifier("abc")')

    def test_syntax_error_expected_lparen(self):
        err = rejects("lw r1, 0 r2, r3")
        assert str(err) == ("Syntax error at line 1: "
                            "Expected '(', got Register(\"r2\")")

    def test_syntax_error_duplicate_label(self):
        # The reference reports duplicates through SyntaxError, not the
        # DuplicateLabel variant (assembler.rs:106-111).
        err = rejects("label:\n    ecall\nlabel:\n    ecall\n")
        assert str(err) == "Syntax error at line 3: Duplicate label: label"

    def test_syntax_error_invalid_label_name(self):
        err = rejects("123label:\n    ecall\n")
        assert str(err).startswith("Syntax error at line 1: ")

    def test_syntax_error_config_arity(self):
        err = rejects(".config limb_bits")
        assert str(err) == ("Syntax error at line 1: "
                            ".config requires 2 arguments: key value")

    def test_invalid_config_value_text(self):
        # error.rs:45-51 — "{key}={value}"
        err = rejects(".config unknown_key 100\n    ecall\n")
        assert str(err) == ("Invalid config value at line 1: "
                            "unknown_key=100")
        assert err.kind == "InvalidConfigValue"

    def test_config_error_text(self):
        # error.rs:38-43 — "Configuration error at line {line}: {source}"
        err = rejects(".config limb_bits 5\n    ecall\n")
        assert str(err).startswith("Configuration error at line 1: ")
        assert err.kind == "ConfigError"

    def test_undefined_label_text(self):
        # error.rs:25-27 (the label-resolution extension exercises it)
        err = rejects("    jal r1, nowhere\n")
        assert str(err) == "Undefined label at line 1: nowhere"
        assert err.kind == "UndefinedLabel"

    def test_invalid_token_text(self):
        # parser.rs:78-81 (the reference loses the line number there —
        # line 0; this assembler keeps the real one)
        err = rejects("add r1, r2, @")
        assert str(err) == ("Syntax error at line 1: "
                            "Invalid token at position 12")

    def test_unknown_opcode_text(self):
        # zkir-disassembler/src/error.rs:10-11 ("Unknown opcode: 0x{:02X}")
        from zkir_tpu.asm.disassembler import decode
        from zkir_tpu.spec.isa import DecodeError

        with pytest.raises(DecodeError) as ei:
            decode(0x7F)
        assert str(ei.value) == "Unknown opcode: 0x7F"

    def test_hex_token_debug_renders_decimal(self):
        # Rust Debug of Hex(255) prints the decimal value
        err = rejects("add r1, r2, 0xFF")
        assert str(err) == ('Syntax error at line 1: '
                            'Expected register, got Hex(255)')
