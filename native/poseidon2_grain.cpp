// Independent re-derivation of the Poseidon2-M31 parameters and
// permutation, for cross-checking the Python implementation
// (zkir_tpu/ops/poseidon2_ref.py).
//
// The upstream reference ships only a Poseidon2 stub
// (zkir-runtime/src/crypto.rs:306-315), so there are no upstream test
// vectors; with no network egress, external KATs cannot be imported
// either.  The anchoring strategy is therefore a SECOND, independent
// implementation written against the primary sources alone (the Grain
// procedure from the original Poseidon reference code and the Poseidon2
// paper, eprint 2023/323) using deliberately different algorithms:
//
//   * Grain LFSR as an 80-bit word register (Python: a list of bits),
//   * external matrix as a literal circ(2*M4, M4, M4, M4) dense
//     matrix-vector product (Python: the paper's appendix-B fast
//     evaluation),
//   * internal matrix as a dense product (Python: sum + diagonal form),
//   * s-box via explicit square-and-multiply on uint64 (Python: field
//     helpers).
//
// Any transcription error in either implementation would make the
// derived constants or permutation outputs disagree;
// tests/test_poseidon2_anchor.py asserts bit-equality of both the full
// constant tables and permutation/sponge outputs.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint64_t P = 2147483647ULL;  // 2^31 - 1
constexpr int WIDTH = 16;
constexpr int RATE = 8;
constexpr int ROUNDS_F = 8;
constexpr int ROUNDS_P = 14;
constexpr int N_BITS = 31;

uint64_t add_p(uint64_t a, uint64_t b) { return (a + b) % P; }
uint64_t mul_p(uint64_t a, uint64_t b) { return (a * b) % P; }

uint64_t pow_p(uint64_t a, uint64_t e) {
  uint64_t acc = 1;
  while (e) {
    if (e & 1) acc = mul_p(acc, a);
    a = mul_p(a, a);
    e >>= 1;
  }
  return acc;
}

// ---------------------------------------------------------------------------
// Grain LFSR (Poseidon reference parameter-generation procedure), kept as
// an 80-bit register in a pair of words.  Bit 0 of the register is the
// OLDEST bit (the Python list's index 0).
// ---------------------------------------------------------------------------

struct Grain {
  // state[i] for i in 0..79, stored LSB-first across two 64-bit words.
  uint64_t lo = 0, hi = 0;  // lo holds bits 0..63, hi holds bits 64..79

  int bit(int i) const {
    return i < 64 ? (int)((lo >> i) & 1) : (int)((hi >> (i - 64)) & 1);
  }

  void shift_in(int b) {
    lo = (lo >> 1) | ((hi & 1) << 63);
    hi = (hi >> 1) | ((uint64_t)b << 15);
  }

  int next_raw() {
    int nb = bit(62) ^ bit(51) ^ bit(38) ^ bit(23) ^ bit(13) ^ bit(0);
    shift_in(nb);
    return nb;
  }

  int next_bit() {
    for (;;) {
      int guard = next_raw();
      int b = next_raw();
      if (guard) return b;
    }
  }

  uint64_t next_field_element() {
    for (;;) {
      uint64_t v = 0;
      for (int i = 0; i < N_BITS; i++) v = (v << 1) | (uint64_t)next_bit();
      if (v < P) return v;
    }
  }

  explicit Grain() {
    // Seed bit layout (MSB-first): 2 bits field type (0b01), 4 bits
    // s-box (0), 12 bits n, 12 bits t, 10 bits R_F, 10 bits R_P, then
    // 30 ones.  Collect MSB-first then store with seed[0] at register
    // bit 0.
    int seed[80];
    int k = 0;
    auto push = [&](uint64_t value, int width) {
      for (int i = width - 1; i >= 0; i--) seed[k++] = (int)((value >> i) & 1);
    };
    push(0b01, 2);
    push(0, 4);
    push(N_BITS, 12);
    push(WIDTH, 12);
    push(ROUNDS_F, 10);
    push(ROUNDS_P, 10);
    push((1ULL << 30) - 1, 30);
    for (int i = 0; i < 80; i++) {
      if (seed[i]) {
        if (i < 64)
          lo |= 1ULL << i;
        else
          hi |= 1ULL << (i - 64);
      }
    }
    for (int i = 0; i < 160; i++) next_raw();
  }
};

// ---------------------------------------------------------------------------
// Parameter derivation (same drawing order as the Python module).
// ---------------------------------------------------------------------------

uint64_t det_mod_p(std::vector<std::vector<uint64_t>> m) {
  int n = (int)m.size();
  uint64_t det = 1;
  for (int col = 0; col < n; col++) {
    int pivot = -1;
    for (int r = col; r < n; r++)
      if (m[r][col] != 0) {
        pivot = r;
        break;
      }
    if (pivot < 0) return 0;
    if (pivot != col) {
      std::swap(m[col], m[pivot]);
      det = P - det;
    }
    det = mul_p(det, m[col][col]);
    uint64_t inv = pow_p(m[col][col], P - 2);
    for (int r = col + 1; r < n; r++) {
      uint64_t f = mul_p(m[r][col], inv);
      for (int c = col; c < n; c++)
        m[r][c] = (m[r][c] + P - mul_p(f, m[col][c])) % P;
    }
  }
  return det;
}

struct Params {
  uint64_t external_c[ROUNDS_F][WIDTH];
  uint64_t internal_c[ROUNDS_P];
  uint64_t diag[WIDTH];
};

const Params& params() {
  static Params p = [] {
    Params out;
    Grain g;
    for (int r = 0; r < ROUNDS_F; r++)
      for (int i = 0; i < WIDTH; i++) out.external_c[r][i] = g.next_field_element();
    for (int r = 0; r < ROUNDS_P; r++) out.internal_c[r] = g.next_field_element();
    for (;;) {
      for (int i = 0; i < WIDTH; i++) out.diag[i] = g.next_field_element();
      std::vector<std::vector<uint64_t>> mi(WIDTH,
                                            std::vector<uint64_t>(WIDTH, 1));
      for (int i = 0; i < WIDTH; i++) mi[i][i] = out.diag[i];
      if (det_mod_p(mi) != 0) break;
    }
    return out;
  }();
  return p;
}

// ---------------------------------------------------------------------------
// Permutation via literal dense matrices (no fast-evaluation shortcuts).
// ---------------------------------------------------------------------------

const uint64_t M4[4][4] = {
    {5, 7, 1, 3}, {4, 6, 1, 1}, {1, 3, 5, 7}, {1, 1, 4, 6}};

// external matrix: block (bi, bj) is (1 + [bi == bj]) * M4
void build_external(uint64_t me[WIDTH][WIDTH]) {
  for (int bi = 0; bi < 4; bi++)
    for (int bj = 0; bj < 4; bj++) {
      uint64_t scale = bi == bj ? 2 : 1;
      for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++)
          me[4 * bi + i][4 * bj + j] = mul_p(scale, M4[i][j]);
    }
}

void matvec(const uint64_t m[WIDTH][WIDTH], const uint64_t* x, uint64_t* y) {
  for (int i = 0; i < WIDTH; i++) {
    uint64_t acc = 0;
    for (int j = 0; j < WIDTH; j++) acc = add_p(acc, mul_p(m[i][j], x[j]));
    y[i] = acc;
  }
}

uint64_t sbox(uint64_t x) { return pow_p(x, 5); }

void permute(uint64_t* state) {
  const Params& pp = params();
  static uint64_t me[WIDTH][WIDTH];
  static uint64_t mi[WIDTH][WIDTH];
  static bool built = false;
  if (!built) {
    build_external(me);
    for (int i = 0; i < WIDTH; i++)
      for (int j = 0; j < WIDTH; j++) mi[i][j] = i == j ? pp.diag[i] : 1;
    built = true;
  }
  uint64_t tmp[WIDTH];

  matvec(me, state, tmp);
  std::memcpy(state, tmp, sizeof(tmp));

  for (int r = 0; r < ROUNDS_F / 2; r++) {
    for (int i = 0; i < WIDTH; i++)
      state[i] = sbox(add_p(state[i], pp.external_c[r][i]));
    matvec(me, state, tmp);
    std::memcpy(state, tmp, sizeof(tmp));
  }
  for (int r = 0; r < ROUNDS_P; r++) {
    state[0] = sbox(add_p(state[0], pp.internal_c[r]));
    matvec(mi, state, tmp);
    std::memcpy(state, tmp, sizeof(tmp));
  }
  for (int r = ROUNDS_F / 2; r < ROUNDS_F; r++) {
    for (int i = 0; i < WIDTH; i++)
      state[i] = sbox(add_p(state[i], pp.external_c[r][i]));
    matvec(me, state, tmp);
    std::memcpy(state, tmp, sizeof(tmp));
  }
}

}  // namespace

extern "C" {

// Writes R_F*t external constants, then R_P internal constants, then t
// diagonal entries into out (8*16 + 14 + 16 = 158 words).
void p2_params(uint64_t* out) {
  const Params& p = params();
  int k = 0;
  for (int r = 0; r < ROUNDS_F; r++)
    for (int i = 0; i < WIDTH; i++) out[k++] = p.external_c[r][i];
  for (int r = 0; r < ROUNDS_P; r++) out[k++] = p.internal_c[r];
  for (int i = 0; i < WIDTH; i++) out[k++] = p.diag[i];
}

// In-place width-16 permutation.
void p2_permute(uint64_t* state) { permute(state); }

// Sponge hash of `n` field elements (already reduced): 1||0* padding to a
// rate-8 multiple, absorb, squeeze 8.
void p2_sponge(const uint64_t* elems, uint64_t n, uint64_t* out8) {
  std::vector<uint64_t> padded(elems, elems + n);
  padded.push_back(1);
  while (padded.size() % RATE) padded.push_back(0);
  uint64_t state[WIDTH] = {0};
  for (size_t off = 0; off < padded.size(); off += RATE) {
    for (int i = 0; i < RATE; i++) state[i] = add_p(state[i], padded[off + i]);
    permute(state);
  }
  for (int i = 0; i < RATE; i++) out8[i] = state[i];
}

}  // extern "C"
