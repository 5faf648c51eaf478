"""Memory subsystem parity tests.

Vector source: reference zkir-runtime/tests/memory_subsystem.rs (48 tests:
regions, endianness, protection, alignment) and memory.rs inline tests.
"""

import pytest

from zkir_tpu.runtime.errors import InvalidMemoryAccess, MisalignedAccess
from zkir_tpu.runtime.memory import Memory, MemoryRegion
from zkir_tpu.spec.memlayout import (
    CODE_BASE,
    DATA_BASE,
    HEAP_BASE,
    STACK_TOP,
)


class TestRegions:
    def test_region_classification(self):
        mem = Memory()
        assert mem.get_region(0x0) == MemoryRegion.RESERVED
        assert mem.get_region(0xFFF) == MemoryRegion.RESERVED
        assert mem.get_region(CODE_BASE) == MemoryRegion.CODE
        assert mem.get_region(DATA_BASE - 1) == MemoryRegion.CODE
        assert mem.get_region(DATA_BASE) == MemoryRegion.DATA
        assert mem.get_region(HEAP_BASE - 1) == MemoryRegion.DATA
        assert mem.get_region(STACK_TOP) == MemoryRegion.STACK
        assert mem.get_region(STACK_TOP - 100) == MemoryRegion.STACK
        # Unmapped space between heap break and stack treated as heap.
        assert mem.get_region(HEAP_BASE + (1 << 30)) == MemoryRegion.HEAP

    def test_heap_break_extends_heap(self):
        mem = Memory()
        mem.set_heap_break(HEAP_BASE + 0x1000)
        assert mem.get_region(HEAP_BASE + 0x500) == MemoryRegion.HEAP

    def test_writability(self):
        assert not MemoryRegion.RESERVED.is_writable
        assert not MemoryRegion.CODE.is_writable
        assert MemoryRegion.DATA.is_writable
        assert MemoryRegion.HEAP.is_writable
        assert MemoryRegion.STACK.is_writable


class TestProtection:
    def test_reserved_write_rejected(self):
        mem = Memory()
        with pytest.raises(InvalidMemoryAccess):
            mem.write_u8(0x10, 1)

    def test_code_write_rejected_after_load(self):
        mem = Memory()
        mem.load_code([0x50], CODE_BASE)
        with pytest.raises(InvalidMemoryAccess):
            mem.write_u32(CODE_BASE, 0xDEADBEEF)

    def test_code_writable_before_load(self):
        mem = Memory()
        mem.write_u32(CODE_BASE, 0x51)  # no code loaded yet: allowed
        assert mem.read_u32(CODE_BASE) == 0x51

    def test_data_write_allowed(self):
        mem = Memory()
        mem.write_u32(DATA_BASE, 0x12345678)
        assert mem.read_u32(DATA_BASE) == 0x12345678

    def test_protection_disable(self):
        mem = Memory()
        mem.set_strict_protection(False)
        mem.write_u8(0x10, 7)  # reserved, but protection off
        assert mem.read_u8(0x10) == 7

    def test_write_spanning_code_boundary_rejected(self):
        mem = Memory()
        mem.load_code([0x50], CODE_BASE)
        with pytest.raises(InvalidMemoryAccess):
            # u64 write starting just below DATA_BASE spans out of CODE.
            mem.write_u64(DATA_BASE - 8, 1)


class TestAccess:
    def test_uninitialized_reads_zero(self):
        mem = Memory()
        assert mem.read_u8(DATA_BASE + 123) == 0
        assert mem.read_u32(DATA_BASE + 124) == 0

    def test_little_endian_layout(self):
        mem = Memory()
        mem.write_u32(DATA_BASE, 0x11223344)
        assert mem.read_u8(DATA_BASE) == 0x44
        assert mem.read_u8(DATA_BASE + 1) == 0x33
        assert mem.read_u8(DATA_BASE + 2) == 0x22
        assert mem.read_u8(DATA_BASE + 3) == 0x11
        assert mem.read_u16(DATA_BASE) == 0x3344
        assert mem.read_u16(DATA_BASE + 2) == 0x1122

    def test_u64_roundtrip(self):
        mem = Memory()
        mem.write_u64(DATA_BASE, 0x0123456789ABCDEF)
        assert mem.read_u64(DATA_BASE) == 0x0123456789ABCDEF
        assert mem.read_u32(DATA_BASE) == 0x89ABCDEF
        assert mem.read_u32(DATA_BASE + 4) == 0x01234567

    @pytest.mark.parametrize("width,align", [(2, 2), (4, 4), (8, 8)])
    def test_misalignment_rejected(self, width, align):
        mem = Memory()
        read = {2: mem.read_u16, 4: mem.read_u32, 8: mem.read_u64}[width]
        write = {2: mem.write_u16, 4: mem.write_u32, 8: mem.write_u64}[width]
        with pytest.raises(MisalignedAccess):
            read(DATA_BASE + 1)
        with pytest.raises(MisalignedAccess):
            write(DATA_BASE + 1, 0)

    def test_sparse_pages(self):
        # Far-apart addresses allocate independent pages (stress_tests.rs).
        mem = Memory()
        mem.set_strict_protection(False)
        addrs = [0x2000, 0x100000, 0x4000000, STACK_TOP - 7]
        for i, addr in enumerate(addrs):
            mem.write_u8(addr, i + 1)
        for i, addr in enumerate(addrs):
            assert mem.read_u8(addr) == i + 1


class TestTraceRecording:
    def test_sub_ops_suppressed(self):
        mem = Memory(trace_enabled=True)
        mem.set_strict_protection(False)
        mem.write_u32(0x2000, 0xAABBCCDD)
        mem.read_u32(0x2000)
        ops = mem.get_trace()
        # One write + one read at full width — no per-byte records.
        assert len(ops) == 2
        assert ops[0].is_write and ops[0].width == 4
        assert ops[1].is_read and ops[1].width == 4
        assert ops[0].value == 0xAABBCCDD

    def test_sorted_trace_ordering(self):
        mem = Memory(trace_enabled=True)
        mem.set_strict_protection(False)
        mem.set_timestamp(5)
        mem.write_u8(0x3000, 1)
        mem.set_timestamp(3)
        mem.write_u8(0x2000, 2)
        mem.read_u8(0x2000)
        ordered = mem.get_sorted_trace()
        # Sorted by timestamp, then address, reads before writes.
        assert [op.timestamp for op in ordered] == [3, 3, 5]
        assert ordered[0].is_read  # read sorts before write at same (t, addr)
