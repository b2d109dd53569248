// Strong connect-four solver: negamax + alpha-beta over bitboards with a
// transposition table.
//
// Role: in-repo replacement for the external Pascal Pons `c4solver` binary
// that the reference uses for ground-truth evaluation
// (/root/reference/games/connect-four/solver.jl:17-56 drives it over
// stdin/stdout; /root/reference/games/connect-four/solver/README.md documents
// the install).  This implementation is written from the well-known published
// algorithm (bitboard win masks, null-window iterative narrowing, move
// ordering) — not a copy of any existing source — and is exposed as a C ABI
// for ctypes (see alphazero_tpu/solver.py).
//
// Provenance / license note: the ALGORITHM closely follows Pascal Pons'
// public solver tutorial (http://blog.gamesolver.org — "Solving Connect 4:
// how to build a perfect AI"; his companion code is AGPL): the
// `current+mask` bitboard key, the non-losing-move mask, center-first
// ordering and the null-window midpoint narrowing are his published design,
// reimplemented here from the written description.  No source code was
// copied; shared idioms are those the tutorial text itself specifies.  The
// companion Test_L*_R* benchmark DATA under alphazero_tpu/data/pons is the
// published dataset (see the provenance README there).
//
// Score convention (matches the reference's expectations,
// games/connect-four/scripts/pons_benchmark.jl): from the perspective of the
// player to move, 0 = draw; +s = forced win when the winner's (22 - s)th
// stone lands; -s = forced loss symmetric.  So faster wins have higher
// scores.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC solver.cpp -o libc4solver.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <cstdlib>

namespace {

constexpr int W = 7;            // columns
constexpr int H = 6;            // rows
constexpr int HP = H + 1;       // column stride (sentinel row)
constexpr int MIN_SCORE = -(W * H) / 2 + 3;
constexpr int MAX_SCORE = (W * H + 1) / 2 - 3;

using u64 = uint64_t;

constexpr u64 bottom_mask_col(int c) { return u64(1) << (c * HP); }
constexpr u64 column_mask(int c) {
  return ((u64(1) << H) - 1) << (c * HP);
}
constexpr u64 top_mask_col(int c) { return u64(1) << ((H - 1) + c * HP); }

constexpr u64 full_bottom() {
  u64 b = 0;
  for (int c = 0; c < W; ++c) b |= bottom_mask_col(c);
  return b;
}
constexpr u64 BOTTOM = full_bottom();
constexpr u64 BOARD_MASK = BOTTOM * ((u64(1) << H) - 1);

// All cells where `pos` would complete four in a row.
u64 winning_spots(u64 pos) {
  // vertical
  u64 r = (pos << 1) & (pos << 2) & (pos << 3);
  // horizontal and the two diagonals share the same shift pattern
  for (int d : {HP, HP - 1, HP + 1}) {
    u64 p = (pos << d) & (pos << 2 * d);
    r |= p & (pos << 3 * d);
    r |= p & (pos >> d);
    p = (pos >> d) & (pos >> 2 * d);
    r |= p & (pos >> 3 * d);
    r |= p & (pos << d);
  }
  return r & (BOARD_MASK ^ 0) ;
}

struct Position {
  u64 current = 0;  // stones of the side to move
  u64 mask = 0;     // all stones
  int moves = 0;    // plies played

  bool can_play(int c) const { return (mask & top_mask_col(c)) == 0; }

  void play(int c) {
    current ^= mask;
    mask |= mask + bottom_mask_col(c);
    ++moves;
  }

  bool is_winning_move(int c) const {
    u64 spots = winning_spots(current) & BOARD_MASK;
    return spots & (mask + bottom_mask_col(c)) & column_mask(c);
  }

  u64 possible() const { return (mask + BOTTOM) & BOARD_MASK; }

  bool can_win_next() const {
    return winning_spots(current) & possible();
  }

  u64 opponent_winning_spots() const {
    return winning_spots(current ^ mask) & BOARD_MASK;
  }

  // Moves that do not hand the opponent an immediate win.
  u64 non_losing_moves() const {
    u64 poss = possible();
    u64 opp = opponent_winning_spots();
    u64 forced = poss & opp;
    if (forced) {
      if (forced & (forced - 1)) return 0;  // >=2 threats: lost
      poss = forced;
    }
    return poss & ~(opp >> 1);  // never play right below a winning spot
  }

  u64 key() const { return current + mask; }

  // Canonical key under the left-right board symmetry: mirrored positions
  // have identical values, so hashing min(key, mirror_key) doubles the
  // effective transposition-table reach.
  u64 sym_key() const {
    u64 k = current + mask;
    u64 mc = 0, mm = 0;
    for (int c = 0; c < W; ++c) {
      u64 colsel = (u64(1) << HP) - 1;
      mc |= ((current >> (c * HP)) & colsel) << ((W - 1 - c) * HP);
      mm |= ((mask >> (c * HP)) & colsel) << ((W - 1 - c) * HP);
    }
    u64 m = mc + mm;
    return k < m ? k : m;
  }

  // Heuristic move score for ordering: number of own winning spots created.
  int move_score(u64 move) const {
    u64 p = current | move;
    u64 spots = winning_spots(p) & BOARD_MASK;
    int n = 0;
    while (spots) { ++n; spots &= spots - 1; }
    return n;
  }
};

struct TT {
  struct Entry { u64 key : 56; int8_t val; };
  std::vector<Entry> tab;
  explicit TT(size_t log2sz) : tab(size_t(1) << log2sz) {}
  void put(u64 k, int8_t v) {
    Entry& e = tab[k % tab.size()];
    e.key = k; e.val = v;
  }
  int get(u64 k) const {
    const Entry& e = tab[k % tab.size()];
    return (e.key == (k & ((u64(1) << 56) - 1))) ? e.val : 0;
  }
};

// Global tables shared across calls: entries are keyed by exact position,
// and alpha-beta fail bounds are sound independently of the search window
// that produced them, so reuse across calls/narrowing passes is safe and
// makes e.g. `c4_solve_moves` (7 sibling solves) share most of its work.
// Sized for the Pons benchmark's near-root weak solves (billions of nodes;
// a small table thrashes): 2 x 2^27 entries x 8 B = 2 GiB.  Override the
// log2 size with C4SOLVER_TT_LOG2 before the first solve.
static size_t tt_log2() {
  if (const char* env = std::getenv("C4SOLVER_TT_LOG2")) {
    int v = std::atoi(env);
    if (v >= 10 && v <= 32) return (size_t)v;
  }
  return 27;
}
TT g_upper{tt_log2()};  // fail-low results: true score <= stored
TT g_lower{tt_log2()};  // fail-high results: true score >= stored

struct Solver {
  TT& tt = g_upper;
  TT& ttlo = g_lower;
  u64 nodes = 0;
  u64 limit = 0;      // 0 = unlimited; else abort once nodes >= limit
  bool aborted = false;
  static constexpr int ORDER[W] = {3, 2, 4, 1, 5, 0, 6};  // center first

  int negamax(Position& p, int alpha, int beta) {
    if (limit && nodes >= limit) {  // budget exhausted: unwind without
      aborted = true;               // storing any (now unsound) TT bounds
      return alpha;
    }
    ++nodes;
    u64 nl = p.non_losing_moves();
    if (nl == 0)  // every move loses immediately
      return -(W * H - p.moves) / 2;
    if (p.moves >= W * H - 2) return 0;  // draw

    int minv = -(W * H - 2 - p.moves) / 2;  // lower bound: we can't win
    u64 key = p.sym_key();
    if (int v = ttlo.get(key)) {
      int lb = v + MIN_SCORE - 1;
      if (lb > minv) minv = lb;
    }
    if (alpha < minv) {
      alpha = minv;
      if (alpha >= beta) return alpha;
    }
    int maxv = (W * H - 1 - p.moves) / 2;  // upper bound
    if (int v = tt.get(key)) maxv = v + MIN_SCORE - 1;
    if (beta > maxv) {
      beta = maxv;
      if (alpha >= beta) return beta;
    }

    // order moves: by threat count, center-first tiebreak
    struct MV { u64 bit; int score; int col; };
    MV moves[W];
    int n = 0;
    for (int i = 0; i < W; ++i) {
      int c = ORDER[i];
      u64 b = nl & column_mask(c);
      if (b) moves[n++] = {b, p.move_score(b), c};
    }
    for (int i = 1; i < n; ++i) {  // insertion sort by score desc (stable)
      MV m = moves[i];
      int j = i;
      while (j > 0 && moves[j - 1].score < m.score) {
        moves[j] = moves[j - 1]; --j;
      }
      moves[j] = m;
    }

    for (int i = 0; i < n; ++i) {
      Position q = p;
      q.current ^= q.mask;
      q.mask |= moves[i].bit;
      ++q.moves;
      int s = -negamax(q, -beta, -alpha);
      if (aborted) return alpha;  // partial result: do not store bounds
      if (s >= beta) {
        ttlo.put(key, int8_t(s - MIN_SCORE + 1));
        return s;
      }
      if (s > alpha) alpha = s;
    }
    tt.put(key, int8_t(alpha - MIN_SCORE + 1));
    return alpha;
  }

  static constexpr int ABORTED = -101;

  int solve(Position p, bool weak) {
    if (p.can_win_next())  // negamax assumes no immediate win available
      return (W * H + 1 - p.moves) / 2;
    int lo = -(W * H - p.moves) / 2, hi = (W * H + 1 - p.moves) / 2;
    if (weak) { lo = -1; hi = 1; }
    while (lo < hi) {  // iterative narrowing with null windows
      int med = lo + (hi - lo) / 2;
      if (med <= 0 && lo / 2 < med) med = lo / 2;
      else if (med >= 0 && hi / 2 > med) med = hi / 2;
      int r = negamax(p, med, med + 1);
      if (aborted) return ABORTED;
      if (r <= med) hi = r; else lo = r;
    }
    return lo;
  }
};

// Returns false on invalid input (illegal move / already won position).
bool position_from_moves(const char* moves, Position& p) {
  p = Position{};
  for (const char* s = moves; *s; ++s) {
    int c = *s - '1';
    if (c < 0 || c >= W || !p.can_play(c)) return false;
    if (p.is_winning_move(c)) return false;  // game already decided
    p.play(c);
  }
  return true;
}

}  // namespace

extern "C" {

// Solve the position reached by `moves` ("4453", 1-based columns), aborting
// once `node_limit` nodes were explored (0 = unlimited).  Returns the score
// for the player to move; INVALID (-100) on bad input; ABORTED (-101) on
// budget exhaustion.  `nodes_out` (optional) receives the node count.
int c4_solve_limited(const char* moves, int weak, long long node_limit,
                     long long* nodes_out) {
  Position p;
  if (!position_from_moves(moves, p)) return -100;
  Solver s;
  s.limit = node_limit > 0 ? (u64)node_limit : 0;
  int score = s.solve(p, weak != 0);
  if (nodes_out) *nodes_out = (long long)s.nodes;
  return score;
}

int c4_solve(const char* moves, int weak, long long* nodes_out) {
  return c4_solve_limited(moves, weak, 0, nodes_out);
}

// Scores after each legal reply: out[c] = score for the OPPONENT after the
// current player plays column c+1 (so the current player's value of move c
// is -out[c]); -100 marks illegal columns, +100 an immediate win, -101 a
// column whose solve exceeded the (per-column) node budget.
void c4_solve_moves_limited(const char* moves, int weak,
                            long long node_limit, int* out) {
  Position p;
  bool ok = position_from_moves(moves, p);
  for (int c = 0; c < W; ++c) {
    out[c] = -100;
    if (!ok || !p.can_play(c)) continue;
    if (p.is_winning_move(c)) { out[c] = 100; continue; }
    Position q = p;
    q.play(c);
    Solver s;
    s.limit = node_limit > 0 ? (u64)node_limit : 0;
    out[c] = s.solve(q, weak != 0);
  }
}

void c4_solve_moves(const char* moves, int weak, int* out) {
  c4_solve_moves_limited(moves, weak, 0, out);
}

}  // extern "C"
