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
