// From-scratch LZMA1 codec (raw streams, no container).
//
// The reference vendors the LZMA SDK 24.07 (reference src/lzma/C/
// LzmaEnc.c, LzmaDec.c, LzFind.c) and calls it through LzmaCompress /
// LzmaUncompress with lc=3 lp=0 pb=2 (src/stream.c:450-458).  This is
// an independent implementation of the published LZMA bitstream:
//
//  - binary range coder, 11-bit adaptive probabilities, 5 move bits
//  - the 12-state literal/match/rep state machine with 4 rep distances
//  - bit-tree length coders (choice/low/mid/high) and the
//    posSlot/SpecPos/Align distance model
//  - matched-literal coding after matches
//
// Encode uses a hash-chain match finder (HC4 class, cf. LzFind.c:880)
// with one-step lazy evaluation (the GetOptimumFast strategy of
// LzmaEnc.c:1970) and always terminates with the end-of-payload marker
// (distance 0xFFFFFFFF), which LzmaUncompress accepts when the output
// size is known.  Decode stops at the requested output length and also
// accepts marker-less SDK streams.  Both directions are cross-validated
// against liblzma and the reference SDK oracle in
// tests/test_reference_interop.py / tests/test_lzma_native.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace tlz {

static bool trace_on() {
    static const bool t = std::getenv("LRZ_LZMA_TRACE") != nullptr;
    return t;
}

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;

constexpr int kNumBitModelTotalBits = 11;
constexpr U32 kBitModelTotal = 1u << kNumBitModelTotalBits;
constexpr int kNumMoveBits = 5;
constexpr U32 kTopValue = 1u << 24;
constexpr U16 kProbInit = (U16)(kBitModelTotal / 2);

constexpr int kNumStates = 12;
constexpr int kNumPosStatesMax = 16;
constexpr int kNumLenToPosStates = 4;
constexpr int kNumPosSlotBits = 6;
constexpr int kNumAlignBits = 4;
constexpr int kEndPosModelIndex = 14;
constexpr int kNumFullDistances = 1 << (kEndPosModelIndex >> 1);  // 128
constexpr int kMatchMinLen = 2;
// length coder symbol ranges
constexpr int kLenLowSymbols = 8;
constexpr int kLenMidSymbols = 8;
constexpr int kLenHighSymbols = 256;
constexpr int kMatchMaxLen = kMatchMinLen + kLenLowSymbols
    + kLenMidSymbols + kLenHighSymbols - 1;  // 273

// ----------------------------------------------------------- models ---

struct LenProbs {
    U16 choice, choice2;
    U16 low[kNumPosStatesMax][kLenLowSymbols];
    U16 mid[kNumPosStatesMax][kLenMidSymbols];
    U16 high[kLenHighSymbols];
};

struct Probs {
    U16 is_match[kNumStates][kNumPosStatesMax];
    U16 is_rep[kNumStates];
    U16 is_rep_g0[kNumStates];
    U16 is_rep_g1[kNumStates];
    U16 is_rep_g2[kNumStates];
    U16 is_rep0_long[kNumStates][kNumPosStatesMax];
    U16 pos_slot[kNumLenToPosStates][1 << kNumPosSlotBits];
    U16 spec_pos[kNumFullDistances - kEndPosModelIndex];
    U16 align[1 << kNumAlignBits];
    LenProbs len, rep_len;
    std::vector<U16> literal;  // 0x300 << (lc + lp)

    void init(int lc, int lp) {
        U16* base = &is_match[0][0];
        size_t fixed = (size_t)((U16*)(&rep_len + 1) - base);
        for (size_t i = 0; i < fixed; i++) base[i] = kProbInit;
        literal.assign((size_t)0x300 << (lc + lp), kProbInit);
    }
};

static inline int state_upd_lit(int s) {
    return s < 4 ? 0 : (s < 10 ? s - 3 : s - 6);
}
static inline int state_upd_match(int s) { return s < 7 ? 7 : 10; }
static inline int state_upd_rep(int s) { return s < 7 ? 8 : 11; }
static inline int state_upd_shortrep(int s) { return s < 7 ? 9 : 11; }

// ------------------------------------------------------ range coder ---

struct RangeDec {
    const U8* buf;
    int64_t pos, size;
    U32 range, code;
    bool overrun = false;

    int next() {
        if (pos < size) return buf[pos++];
        overrun = true;
        return 0;
    }
    void init() {
        range = 0xFFFFFFFFu;
        code = 0;
        next();  // first byte is always 0
        for (int i = 0; i < 4; i++) code = (code << 8) | next();
    }
    inline void normalize() {
        if (range < kTopValue) {
            range <<= 8;
            code = (code << 8) | next();
        }
    }
    inline int decode_bit(U16& p) {
        U32 bound = (range >> kNumBitModelTotalBits) * p;
        int bit;
        if (code < bound) {
            range = bound;
            p += (U16)((kBitModelTotal - p) >> kNumMoveBits);
            bit = 0;
        } else {
            range -= bound;
            code -= bound;
            p -= (U16)(p >> kNumMoveBits);
            bit = 1;
        }
        normalize();
        return bit;
    }
    U32 decode_direct(int n) {
        U32 res = 0;
        do {
            range >>= 1;
            code -= range;
            U32 t = 0 - (code >> 31);
            code += range & t;
            normalize();
            res = (res << 1) + (t + 1);
        } while (--n);
        return res;
    }
    int tree_decode(U16* probs, int nbits) {
        int m = 1;
        for (int i = 0; i < nbits; i++) m = (m << 1) | decode_bit(probs[m]);
        return m - (1 << nbits);
    }
    int tree_reverse_decode(U16* probs, int nbits) {
        int m = 1, sym = 0;
        for (int i = 0; i < nbits; i++) {
            int b = decode_bit(probs[m]);
            m = (m << 1) | b;
            sym |= b << i;
        }
        return sym;
    }
    int len_decode(LenProbs& lp, int pos_state) {
        if (!decode_bit(lp.choice))
            return tree_decode(lp.low[pos_state], 3);
        if (!decode_bit(lp.choice2))
            return kLenLowSymbols + tree_decode(lp.mid[pos_state], 3);
        return kLenLowSymbols + kLenMidSymbols + tree_decode(lp.high, 8);
    }
};

struct RangeEnc {
    std::vector<U8>& out;
    U64 low = 0;
    U32 range = 0xFFFFFFFFu;
    U8 cache = 0;
    int64_t cache_size = 1;
    explicit RangeEnc(std::vector<U8>& o) : out(o) {}

    void shift_low() {
        if ((U32)low < 0xFF000000u || (int)(low >> 32) != 0) {
            U8 temp = cache;
            do {
                out.push_back((U8)(temp + (U8)(low >> 32)));
                temp = 0xFF;
            } while (--cache_size);
            cache = (U8)(low >> 24);
        }
        cache_size++;
        low = (low << 8) & 0xFFFFFFFFu;
    }
    inline void encode_bit(U16& p, int bit) {
        U32 bound = (range >> kNumBitModelTotalBits) * p;
        if (!bit) {
            range = bound;
            p += (U16)((kBitModelTotal - p) >> kNumMoveBits);
        } else {
            low += bound;
            range -= bound;
            p -= (U16)(p >> kNumMoveBits);
        }
        while (range < kTopValue) {
            range <<= 8;
            shift_low();
        }
    }
    void encode_direct(U32 v, int n) {
        for (int i = n - 1; i >= 0; i--) {
            range >>= 1;
            if ((v >> i) & 1) low += range;
            while (range < kTopValue) {
                range <<= 8;
                shift_low();
            }
        }
    }
    void tree_encode(U16* probs, int nbits, int sym) {
        int m = 1;
        for (int i = nbits - 1; i >= 0; i--) {
            int b = (sym >> i) & 1;
            encode_bit(probs[m], b);
            m = (m << 1) | b;
        }
    }
    void tree_reverse_encode(U16* probs, int nbits, int sym) {
        int m = 1;
        for (int i = 0; i < nbits; i++) {
            int b = (sym >> i) & 1;
            encode_bit(probs[m], b);
            m = (m << 1) | b;
        }
    }
    void len_encode(LenProbs& lp, int pos_state, int len) {
        // len is the coded symbol (actual - kMatchMinLen)
        if (len < kLenLowSymbols) {
            encode_bit(lp.choice, 0);
            tree_encode(lp.low[pos_state], 3, len);
        } else if (len < kLenLowSymbols + kLenMidSymbols) {
            encode_bit(lp.choice, 1);
            encode_bit(lp.choice2, 0);
            tree_encode(lp.mid[pos_state], 3, len - kLenLowSymbols);
        } else {
            encode_bit(lp.choice, 1);
            encode_bit(lp.choice2, 1);
            tree_encode(lp.high, 8,
                        len - kLenLowSymbols - kLenMidSymbols);
        }
    }
    void flush() {
        for (int i = 0; i < 5; i++) shift_low();
    }
};

// ---------------------------------------------------------- decoder ---

// Returns bytes produced (== u_len) or -1 on corrupt stream.
int64_t decode(const U8* in, int64_t in_len, U8* out, int64_t u_len,
               int lc, int lp, int pb) {
    if (lc < 0 || lc > 8 || lp < 0 || lp > 4 || pb < 0 || pb > 4)
        return -1;
    if (u_len == 0) return 0;
    if (in_len < 5) return -1;
    Probs P;
    P.init(lc, lp);
    RangeDec rc{in, 0, in_len, 0, 0};
    rc.init();

    const U32 pb_mask = (1u << pb) - 1;
    const U32 lp_mask = (1u << lp) - 1;
    int state = 0;
    U32 rep0 = 0, rep1 = 0, rep2 = 0, rep3 = 0;
    int64_t pos = 0;

    while (pos < u_len) {
        int pos_state = (int)((U32)pos & pb_mask);
        if (!rc.decode_bit(P.is_match[state][pos_state])) {
            // literal
            U8 prev = pos ? out[pos - 1] : 0;
            U16* probs = &P.literal[
                (size_t)0x300 * ((((U32)pos & lp_mask) << lc)
                                 + (prev >> (8 - lc)))];
            int sym = 1;
            if (state >= 7) {
                if ((U64)rep0 + 1 > (U64)pos) return -1;
                U8 match_byte = out[pos - rep0 - 1];
                do {
                    int match_bit = (match_byte >> 7) & 1;
                    match_byte <<= 1;
                    int bit = rc.decode_bit(
                        probs[((1 + match_bit) << 8) + sym]);
                    sym = (sym << 1) | bit;
                    if (match_bit != bit) break;
                } while (sym < 0x100);
            }
            while (sym < 0x100)
                sym = (sym << 1) | rc.decode_bit(probs[sym]);
            out[pos++] = (U8)(sym - 0x100);
            state = state_upd_lit(state);
            continue;
        }
        int len;
        if (rc.decode_bit(P.is_rep[state])) {
            // rep match
            if (pos == 0) return -1;
            if (!rc.decode_bit(P.is_rep_g0[state])) {
                if (!rc.decode_bit(P.is_rep0_long[state][pos_state])) {
                    // short rep: one byte from rep0
                    if ((U64)rep0 + 1 > (U64)pos) return -1;
                    out[pos] = out[pos - rep0 - 1];
                    pos++;
                    state = state_upd_shortrep(state);
                    continue;
                }
            } else {
                U32 dist;
                if (!rc.decode_bit(P.is_rep_g1[state])) {
                    dist = rep1;
                } else if (!rc.decode_bit(P.is_rep_g2[state])) {
                    dist = rep2;
                    rep2 = rep1;
                } else {
                    dist = rep3;
                    rep3 = rep2;
                    rep2 = rep1;
                }
                rep1 = rep0;
                rep0 = dist;
            }
            len = rc.len_decode(P.rep_len, pos_state) + kMatchMinLen;
            state = state_upd_rep(state);
        } else {
            // normal match
            rep3 = rep2;
            rep2 = rep1;
            rep1 = rep0;
            len = rc.len_decode(P.len, pos_state) + kMatchMinLen;
            int lps = len - kMatchMinLen < kNumLenToPosStates
                ? len - kMatchMinLen : kNumLenToPosStates - 1;
            int slot = rc.tree_decode(P.pos_slot[lps], kNumPosSlotBits);
            U32 dist;
            if (slot < 4) {
                dist = (U32)slot;
            } else {
                int ndirect = (slot >> 1) - 1;
                dist = (U32)(2 | (slot & 1)) << ndirect;
                if (slot < kEndPosModelIndex) {
                    dist += (U32)rc.tree_reverse_decode(
                        P.spec_pos + dist - slot - 1, ndirect);
                } else {
                    dist += rc.decode_direct(ndirect - kNumAlignBits)
                            << kNumAlignBits;
                    dist += (U32)rc.tree_reverse_decode(P.align,
                                                        kNumAlignBits);
                }
            }
            if (dist == 0xFFFFFFFFu) {
                // end-of-payload marker before u_len bytes: corrupt
                return -1;
            }
            rep0 = dist;
            state = state_upd_match(state);
        }
        if (trace_on())
            std::fprintf(stderr, "D pos=%lld len=%d dist=%u state=%d\n",
                         (long long)pos, len, rep0, state);
        if ((U64)rep0 + 1 > (U64)pos) return -1;
        if (pos + len > u_len) return -1;
        const U8* src = out + pos - rep0 - 1;
        for (int i = 0; i < len; i++) out[pos + i] = src[i];
        pos += len;
    }
    if (rc.overrun) return -1;
    return pos;
}

// ---------------------------------------------------------- encoder ---

// HC4 hash-chain match finder over the whole input buffer.
struct MatchFinder {
    const U8* in;
    int64_t n;
    U32 dict;
    int depth;
    std::vector<int32_t> head;
    std::vector<int32_t> prev;
    static constexpr int HB = 17;

    MatchFinder(const U8* d, int64_t len, U32 dict_size, int dep)
        : in(d), n(len), dict(dict_size), depth(dep),
          head((size_t)1 << HB, -1), prev((size_t)len, -1) {}

    static inline U32 hash4(const U8* p) {
        U32 x;
        std::memcpy(&x, p, 4);
        return (x * 2654435761u) >> (32 - HB);
    }

    inline void insert(int64_t i) {
        if (i + 4 > n) return;
        U32 h = hash4(in + i);
        prev[(size_t)i] = head[h];
        head[h] = (int32_t)i;
    }

    // longest match at i (also inserts i).  Returns len (0 if < 2) and
    // the distance-1 via *dist.
    int find(int64_t i, U32* dist) {
        int best = 0;
        if (i + 4 > n) { if (i < n) insert(i); return 0; }
        U32 h = hash4(in + i);
        int32_t j = head[h];
        prev[(size_t)i] = j;
        head[h] = (int32_t)i;
        const int64_t max_len_avail =
            (n - i) < kMatchMaxLen ? (n - i) : kMatchMaxLen;
        const U8* q = in + i;
        for (int d = depth; j >= 0 && d > 0; --d) {
            int64_t back = i - j;
            if (back > dict) break;
            const U8* p = in + j;
            if (p[best] == q[best]) {
                int l = 0;
                while (l + 8 <= max_len_avail) {
                    U64 x, y;
                    std::memcpy(&x, p + l, 8);
                    std::memcpy(&y, q + l, 8);
                    if (x != y) {
                        l += __builtin_ctzll(x ^ y) >> 3;
                        goto done;
                    }
                    l += 8;
                }
                while (l < max_len_avail && p[l] == q[l]) l++;
            done:
                if (l > best) {
                    best = l;
                    *dist = (U32)(back - 1);
                    if (l >= max_len_avail) break;
                }
            }
            j = prev[(size_t)j];
        }
        return best;
    }
};

static inline int match_len_at(const U8* in, int64_t n, int64_t i,
                               U32 rep /* dist-1 */) {
    int64_t back = (int64_t)rep + 1;
    if (back > i) return 0;
    const U8* p = in + i - back;
    const U8* q = in + i;
    int64_t maxl = (n - i) < kMatchMaxLen ? (n - i) : kMatchMaxLen;
    int l = 0;
    while (l < maxl && p[l] == q[l]) l++;
    return l;
}

static void encode_literal(RangeEnc& rc, Probs& P, const U8* in,
                           int64_t pos, int state, U32 rep0, int lc,
                           U32 lp_mask) {
    U8 prev = pos ? in[pos - 1] : 0;
    U16* probs = &P.literal[
        (size_t)0x300 * ((((U32)pos & lp_mask) << lc)
                         + (prev >> (8 - lc)))];
    int sym = 0x100 | in[pos];
    if (state >= 7) {
        U8 match_byte = in[pos - rep0 - 1];
        int m = 1;
        int i = 7;
        for (; i >= 0; i--) {
            int match_bit = (match_byte >> i) & 1;
            int bit = (sym >> i) & 1;
            rc.encode_bit(probs[((1 + match_bit) << 8) + m], bit);
            m = (m << 1) | bit;
            if (match_bit != bit) { i--; break; }
        }
        for (; i >= 0; i--) {
            int bit = (sym >> i) & 1;
            rc.encode_bit(probs[m], bit);
            m = (m << 1) | bit;
        }
    } else {
        int m = 1;
        for (int i = 7; i >= 0; i--) {
            int bit = (sym >> i) & 1;
            rc.encode_bit(probs[m], bit);
            m = (m << 1) | bit;
        }
    }
}

static void encode_distance(RangeEnc& rc, Probs& P, int len, U32 dist) {
    int lps = len - kMatchMinLen < kNumLenToPosStates
        ? len - kMatchMinLen : kNumLenToPosStates - 1;
    int slot;
    if (dist < 4) {
        slot = (int)dist;
    } else {
        int zz = 31 - __builtin_clz(dist);
        slot = (zz << 1) | (int)((dist >> (zz - 1)) & 1);
    }
    rc.tree_encode(P.pos_slot[lps], kNumPosSlotBits, slot);
    if (slot >= 4) {
        int ndirect = (slot >> 1) - 1;
        U32 base = (U32)(2 | (slot & 1)) << ndirect;
        U32 rest = dist - base;
        if (slot < kEndPosModelIndex) {
            rc.tree_reverse_encode(P.spec_pos + base - slot - 1,
                                   ndirect, (int)rest);
        } else {
            rc.encode_direct(rest >> kNumAlignBits,
                             ndirect - kNumAlignBits);
            rc.tree_reverse_encode(P.align, kNumAlignBits,
                                   (int)(rest & ((1 << kNumAlignBits)
                                                 - 1)));
        }
    }
}

int64_t encode(const U8* in, int64_t n, std::vector<U8>& out, int level,
               U32 dict_size, int lc, int lp, int pb) {
    Probs P;
    P.init(lc, lp);
    RangeEnc rc(out);
    const U32 pb_mask = (1u << pb) - 1;
    const U32 lp_mask = (1u << lp) - 1;
    int state = 0;
    U32 reps[4] = {0, 0, 0, 0};

    int depth = level <= 2 ? 8 : (level <= 5 ? 24 : (level <= 7 ? 48 : 96));
    int nice = level < 7 ? 32 : 64;  // fb mapping (src/stream.c:455)
    MatchFinder mf(in, n, dict_size ? dict_size : 0xFFFFFFFFu, depth);

    int64_t pos = 0;
    // pending match found by the lazy look-ahead for the next position
    int have_next = 0;
    int next_len = 0;
    U32 next_dist = 0;

    while (pos < n) {
        int main_len;
        U32 main_dist = 0;
        if (have_next) {
            main_len = next_len;
            main_dist = next_dist;
            have_next = 0;
        } else {
            main_len = mf.find(pos, &main_dist);
        }
        // best rep match
        int rep_len = 0, rep_idx = 0;
        for (int r = 0; r < 4; r++) {
            int l = match_len_at(in, n, pos, reps[r]);
            if (l > rep_len) { rep_len = l; rep_idx = r; }
        }
        // normal-match admissibility (cheap dist/len sanity like
        // GetOptimumFast's ChangePair rules)
        if (main_len == 2 && main_dist >= 512) main_len = 0;
        if (main_len == 3 && main_dist >= (1u << 15)) main_len = 2;
        if (main_len < kMatchMinLen) main_len = 0;

        bool use_rep = rep_len >= 2
            && (rep_len + 1 >= main_len
                || (rep_len + 2 >= main_len && main_dist >= (1u << 9))
                || (rep_len + 3 >= main_len && main_dist >= (1u << 15)));

        if (!use_rep && main_len >= kMatchMinLen && main_len < nice
            && pos + 1 < n) {
            // one-step lazy with the SDK's distance-aware preference
            // rules (GetOptimumFast, LzmaEnc.c:1970: a slightly longer
            // match is not worth it when its distance class jumps)
            next_len = mf.find(pos + 1, &next_dist);
            have_next = 1;
            auto change_pair = [](U32 small, U32 big) {
                return (big >> 7) > small;
            };
            bool lit = false;
            if (next_len >= main_len && next_dist < main_dist)
                lit = true;
            else if (next_len == main_len + 1
                     && !change_pair(main_dist, next_dist))
                lit = true;
            else if (next_len > main_len + 1)
                lit = true;
            else if (next_len + 1 >= main_len && main_len >= 3
                     && change_pair(next_dist, main_dist))
                lit = true;
            if (lit) main_len = 0;
        }

        int pos_state = (int)((U32)pos & pb_mask);
        if (use_rep && rep_len >= 2) {
            if (trace_on())
                std::fprintf(stderr, "E pos=%lld REP len=%d idx=%d dist=%u\n",
                             (long long)pos, rep_len, rep_idx, reps[rep_idx]);
            rc.encode_bit(P.is_match[state][pos_state], 1);
            rc.encode_bit(P.is_rep[state], 1);
            U32 dist = reps[rep_idx];
            if (rep_idx == 0) {
                rc.encode_bit(P.is_rep_g0[state], 0);
                if (rep_len == 1) {
                    rc.encode_bit(P.is_rep0_long[state][pos_state], 0);
                    state = state_upd_shortrep(state);
                    pos += 1;
                    continue;
                }
                rc.encode_bit(P.is_rep0_long[state][pos_state], 1);
            } else {
                rc.encode_bit(P.is_rep_g0[state], 1);
                if (rep_idx == 1) {
                    rc.encode_bit(P.is_rep_g1[state], 0);
                } else {
                    rc.encode_bit(P.is_rep_g1[state], 1);
                    rc.encode_bit(P.is_rep_g2[state], rep_idx == 3);
                    if (rep_idx == 3) reps[3] = reps[2];
                    reps[2] = reps[1];
                }
                reps[1] = reps[0];
                reps[0] = dist;
            }
            rc.len_encode(P.rep_len, pos_state, rep_len - kMatchMinLen);
            state = state_upd_rep(state);
            // feed skipped positions to the match finder
            if (have_next) {
                for (int64_t k = pos + 2; k < pos + rep_len; k++)
                    mf.insert(k);
            } else {
                for (int64_t k = pos + 1; k < pos + rep_len; k++)
                    mf.insert(k);
            }
            have_next = 0;
            pos += rep_len;
        } else if (main_len >= kMatchMinLen) {
            if (trace_on())
                std::fprintf(stderr, "E pos=%lld MATCH len=%d dist=%u\n",
                             (long long)pos, main_len, main_dist);
            rc.encode_bit(P.is_match[state][pos_state], 1);
            rc.encode_bit(P.is_rep[state], 0);
            reps[3] = reps[2];
            reps[2] = reps[1];
            reps[1] = reps[0];
            reps[0] = main_dist;
            rc.len_encode(P.len, pos_state, main_len - kMatchMinLen);
            encode_distance(rc, P, main_len, main_dist);
            state = state_upd_match(state);
            if (have_next) {
                for (int64_t k = pos + 2; k < pos + main_len; k++)
                    mf.insert(k);
            } else {
                for (int64_t k = pos + 1; k < pos + main_len; k++)
                    mf.insert(k);
            }
            have_next = 0;
            pos += main_len;
        } else {
            rc.encode_bit(P.is_match[state][pos_state], 0);
            encode_literal(rc, P, in, pos, state, reps[0], lc, lp_mask);
            state = state_upd_lit(state);
            pos += 1;
        }
    }
    // end-of-payload marker: match with distance 0xFFFFFFFF, len 2
    {
        int pos_state = (int)((U32)pos & pb_mask);
        rc.encode_bit(P.is_match[state][pos_state], 1);
        rc.encode_bit(P.is_rep[state], 0);
        rc.len_encode(P.len, pos_state, 0);
        encode_distance(rc, P, kMatchMinLen, 0xFFFFFFFFu);
    }
    rc.flush();
    return (int64_t)out.size();
}

}  // namespace tlz

extern "C" {

// Raw LZMA1 encode; returns bytes written, or -1 when the result would
// exceed cap.
int64_t lzma1_encode(const uint8_t* in, int64_t n, uint8_t* out,
                     int64_t cap, int level, uint32_t dict_size,
                     int lc, int lp, int pb) {
    if (lc < 0 || lc > 8 || lp < 0 || lp > 4 || pb < 0 || pb > 4)
        return -1;
    std::vector<uint8_t> buf;
    buf.reserve((size_t)(n / 2 + 256));
    int64_t r = tlz::encode(in, n, buf, level, dict_size, lc, lp, pb);
    if (r < 0 || r > cap) return -1;
    std::memcpy(out, buf.data(), (size_t)r);
    return r;
}

// Raw LZMA1 decode of exactly u_len bytes; returns u_len or -1 on
// corruption.
int64_t lzma1_decode(const uint8_t* in, int64_t n, uint8_t* out,
                     int64_t u_len, int lc, int lp, int pb) {
    return tlz::decode(in, n, out, u_len, lc, lp, pb);
}

}  // extern "C"
