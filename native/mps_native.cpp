// Native problem-ingestion kernels for madipm_tpu.
//
// The reference's native muscle lives in its dependencies (cuDSS, CUSPARSE,
// HSL — SURVEY §2.2); its host-side ingestion (QPSReader.jl, coo_to_csr at
// src/utils.jl:158-207) is pure Julia.  Here the host runtime pieces that
// sit on the critical path of benchmark sweeps — MPS tokenization/parsing
// and COO->CSR conversion — are C++, exposed through a plain C ABI consumed
// via ctypes (madipm_tpu/models/native.py), with the Python implementations
// as reference/fallback.
//
// Build: make -C native   (produces libmadipm_native.so)

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Triplet {
  int32_t i, j;
  double v;
};

struct MpsData {
  std::string name;
  std::string error;
  bool maximize = false;
  double c0 = 0.0;
  int32_t nvar = 0, ncon = 0;
  std::vector<Triplet> A;
  std::vector<Triplet> Q;  // lower triangle of the symmetric Hessian
  std::vector<double> c, lvar, uvar, lcon, ucon;
  std::vector<uint8_t> integer_mask;
  std::vector<char> row_type;  // 'L','G','E'
  int64_t n_unknown = 0;  // dropped row references (fixed-format signature)
};

// Split a line into whitespace-separated tokens (no allocation per token).
inline void tokenize(const char* s, size_t len, std::vector<std::string>& out) {
  out.clear();
  size_t i = 0;
  while (i < len) {
    while (i < len && std::isspace((unsigned char)s[i])) i++;
    size_t start = i;
    while (i < len && !std::isspace((unsigned char)s[i])) i++;
    if (i > start) out.emplace_back(s + start, i - start);
  }
}

inline std::string upper(std::string t) {
  for (auto& ch : t) ch = std::toupper((unsigned char)ch);
  return t;
}

// Classic fixed-MPS field positions (0-indexed, end-exclusive):
// F1 type, F2 name, F3 name, F4 value, F5 name, F6 value.  Names keep
// EMBEDDED spaces (ends stripped); a '$' starting field 3 or 5 comments
// out the rest of the line.  Mirrors models/mps.py::_fixed_split.
inline void fixed_fields(const char* s, size_t len, std::string out[6]) {
  static const size_t kF[6][2] = {{1, 3}, {4, 12}, {14, 22}, {24, 36}, {39, 47}, {49, 61}};
  for (int k = 0; k < 6; k++) {
    size_t a = kF[k][0], b = std::min(kF[k][1], len);
    std::string f = (a < len) ? std::string(s + a, b - a) : std::string();
    size_t st = f.find_first_not_of(" \t\r");
    size_t en = f.find_last_not_of(" \t\r");
    f = (st == std::string::npos) ? std::string() : f.substr(st, en - st + 1);
    if ((k == 2 || k == 4) && !f.empty() && f[0] == '$') {
      for (int z = k; z < 6; z++) out[z].clear();
      return;
    }
    out[k] = f;
  }
}

// Map the positional fields onto the token shapes the free-format body
// consumes (mirrors models/mps.py::parse_mps._fixed_tok).
inline void fixed_tokenize(const char* s, size_t len, int section,
                           std::vector<std::string>& out) {
  // section codes: 2=ROWS 3=COLUMNS 4=RHS 5=RANGES 6=BOUNDS 7=QUAD
  std::string f[6];
  fixed_fields(s, len, f);
  out.clear();
  if (section == 2) {  // ROWS
    if (!f[0].empty()) out.push_back(f[0]);
    if (!f[1].empty()) out.push_back(f[1]);
  } else if (section == 3 || section == 7) {  // COLUMNS / QUAD
    if (upper(f[2]) == "'MARKER'") {
      out.push_back(f[1]);
      out.push_back(f[2]);
      out.push_back(f[4]);
      return;
    }
    out.push_back(f[1]);
    if (!f[2].empty() && !f[3].empty()) { out.push_back(f[2]); out.push_back(f[3]); }
    if (!f[4].empty() && !f[5].empty()) { out.push_back(f[4]); out.push_back(f[5]); }
  } else if (section == 4 || section == 5) {  // RHS / RANGES
    if (!f[1].empty()) out.push_back(f[1]);
    if (!f[2].empty() && !f[3].empty()) { out.push_back(f[2]); out.push_back(f[3]); }
    if (!f[4].empty() && !f[5].empty()) { out.push_back(f[4]); out.push_back(f[5]); }
  } else {  // BOUNDS
    out.push_back(f[0]);
    out.push_back(f[1].empty() ? std::string("BND") : f[1]);
    out.push_back(f[2]);
    if (!f[3].empty()) out.push_back(f[3]);
  }
}

MpsData* parse_mps_text(const char* text, size_t len, bool fixed = false) {
  auto* d = new MpsData();
  std::unordered_map<std::string, int32_t> rows;  // constraint rows only
  std::unordered_map<std::string, int32_t> cols;
  std::string obj_name;
  bool have_obj = false;

  std::vector<double> rhs;     // per row
  std::vector<double> range;   // per row (NaN = unset)
  std::vector<uint8_t> explicit_lb;

  auto col_id = [&](const std::string& nm) -> int32_t {
    auto it = cols.find(nm);
    if (it != cols.end()) return it->second;
    int32_t id = d->nvar++;
    cols.emplace(nm, id);
    d->c.push_back(0.0);
    d->lvar.push_back(0.0);
    d->uvar.push_back(kInf);
    d->integer_mask.push_back(0);
    explicit_lb.push_back(0);
    return id;
  };

  enum Section { NONE, OBJSENSE, ROWS, COLUMNS, RHS, RANGES, BOUNDS, QUAD, SKIP };
  Section sec = NONE;
  bool quad_full = false;  // QMATRIX lists the full matrix
  bool in_integer = false;
  std::vector<std::string> tok;
  tok.reserve(16);

  size_t pos = 0;
  while (pos < len) {
    size_t eol = pos;
    while (eol < len && text[eol] != '\n') eol++;
    const char* line = text + pos;
    size_t llen = eol - pos;
    pos = eol + 1;
    if (llen == 0) continue;
    if (line[0] == '*') continue;
    bool header = !std::isspace((unsigned char)line[0]);
    if (fixed && !header && sec >= ROWS && sec <= QUAD) {
      fixed_tokenize(line, llen, (int)sec, tok);
    } else {
      tokenize(line, llen, tok);
      // Free-format '$' comment: a token starting with $ ends the line.
      for (size_t z = 0; z < tok.size(); z++) {
        if (!tok[z].empty() && tok[z][0] == '$') { tok.resize(z); break; }
      }
    }
    if (tok.empty()) continue;

    if (header) {
      std::string head = upper(tok[0]);
      if (head == "NAME") {
        if (tok.size() > 1) d->name = tok[1];
        sec = NONE;
      } else if (head == "OBJSENSE") {
        sec = OBJSENSE;
        if (tok.size() > 1) {
          std::string v = upper(tok[1]);
          d->maximize = (v == "MAX" || v == "MAXIMIZE");
          sec = SKIP;
        }
      } else if (head == "ROWS") sec = ROWS;
      else if (head == "COLUMNS") sec = COLUMNS;
      else if (head == "RHS") sec = RHS;
      else if (head == "RANGES") sec = RANGES;
      else if (head == "BOUNDS") sec = BOUNDS;
      else if (head == "QUADOBJ" || head == "QSECTION") { sec = QUAD; quad_full = false; }
      else if (head == "QMATRIX") { sec = QUAD; quad_full = true; }
      else if (head == "ENDATA") break;
      else sec = SKIP;
      continue;
    }

    switch (sec) {
      case OBJSENSE: {
        std::string v = upper(tok[0]);
        d->maximize = (v == "MAX" || v == "MAXIMIZE");
        sec = SKIP;
        break;
      }
      case ROWS: {
        if (tok.size() < 2) break;
        char t = std::toupper((unsigned char)tok[0][0]);
        if (t == 'N') {
          if (!have_obj) { obj_name = tok[1]; have_obj = true; }
        } else {
          rows.emplace(tok[1], d->ncon++);
          d->row_type.push_back(t);
          rhs.push_back(0.0);
          range.push_back(std::nan(""));
        }
        break;
      }
      case COLUMNS: {
        if (tok.size() >= 3 && upper(tok[1]) == "'MARKER'") {
          std::string l = upper(std::string(line, llen));
          if (l.find("INTORG") != std::string::npos) in_integer = true;
          else if (l.find("INTEND") != std::string::npos) in_integer = false;
          break;
        }
        int32_t j = col_id(tok[0]);
        if (in_integer) d->integer_mask[j] = 1;
        for (size_t k = 1; k + 1 < tok.size(); k += 2) {
          double v = std::strtod(tok[k + 1].c_str(), nullptr);
          if (have_obj && tok[k] == obj_name) {
            d->c[j] += v;
          } else {
            auto it = rows.find(tok[k]);
            if (it != rows.end()) d->A.push_back({it->second, j, v});
            else d->n_unknown++;
          }
        }
        break;
      }
      case RHS: {
        size_t start = (tok.size() % 2 == 1) ? 1 : 0;
        for (size_t k = start; k + 1 < tok.size(); k += 2) {
          double v = std::strtod(tok[k + 1].c_str(), nullptr);
          if (have_obj && tok[k] == obj_name) {
            d->c0 = -v;
          } else {
            auto it = rows.find(tok[k]);
            if (it != rows.end()) rhs[it->second] = v;
            else d->n_unknown++;
          }
        }
        break;
      }
      case RANGES: {
        size_t start = (tok.size() % 2 == 1) ? 1 : 0;
        for (size_t k = start; k + 1 < tok.size(); k += 2) {
          auto it = rows.find(tok[k]);
          if (it != rows.end())
            range[it->second] = std::strtod(tok[k + 1].c_str(), nullptr);
        }
        break;
      }
      case BOUNDS: {
        if (tok.size() < 2) break;
        std::string bt = upper(tok[0]);
        // "BTYPE SET COL [VAL]"; the set name may be omitted
        // ("BTYPE COL [VAL]") — mirror the Python parser's detection.
        bool needs_val = (bt == "UP" || bt == "LO" || bt == "FX" ||
                          bt == "UI" || bt == "LI");
        std::string cn;
        double v = 0.0;
        if (needs_val) {
          if (tok.size() >= 4) {
            cn = tok[2];
            v = std::strtod(tok[3].c_str(), nullptr);
          } else if (tok.size() == 3) {
            char* endp = nullptr;
            double maybe = std::strtod(tok[2].c_str(), &endp);
            if (endp && *endp == '\0' && endp != tok[2].c_str()) {
              cn = tok[1];  // omitted set name: "UP COL 4.0"
              v = maybe;
            } else {
              cn = tok[2];  // malformed: value missing, keep 0.0
            }
          } else {
            break;
          }
        } else {  // FR/MI/PL/BV take no value
          cn = (tok.size() >= 3) ? tok[2] : tok[1];
        }
        int32_t j = col_id(cn);
        if (bt == "UP") {
          d->uvar[j] = v;
          if (v < 0 && !explicit_lb[j]) d->lvar[j] = -kInf;
        } else if (bt == "LO") { d->lvar[j] = v; explicit_lb[j] = 1; }
        else if (bt == "FX") { d->lvar[j] = v; d->uvar[j] = v; explicit_lb[j] = 1; }
        else if (bt == "FR") { d->lvar[j] = -kInf; d->uvar[j] = kInf; explicit_lb[j] = 1; }
        else if (bt == "MI") { d->lvar[j] = -kInf; explicit_lb[j] = 1; }
        else if (bt == "PL") { d->uvar[j] = kInf; }
        else if (bt == "BV") { d->lvar[j] = 0; d->uvar[j] = 1; d->integer_mask[j] = 1; explicit_lb[j] = 1; }
        else if (bt == "UI") { d->uvar[j] = v; d->integer_mask[j] = 1; }
        else if (bt == "LI") { d->lvar[j] = v; d->integer_mask[j] = 1; explicit_lb[j] = 1; }
        break;
      }
      case QUAD: {
        for (size_t k = 1; k + 1 < tok.size(); k += 2) {
          int32_t i = col_id(tok[0]);
          int32_t j = col_id(tok[k]);
          double v = std::strtod(tok[k + 1].c_str(), nullptr);
          if (quad_full) {
            if (i >= j) d->Q.push_back({i, j, v});  // keep lower triangle
          } else {
            d->Q.push_back({i, j, v});
          }
        }
        break;
      }
      default:
        break;
    }
  }

  // Row bounds from types + rhs + ranges.
  d->lcon.assign(d->ncon, -kInf);
  d->ucon.assign(d->ncon, kInf);
  for (int32_t i = 0; i < d->ncon; i++) {
    char t = d->row_type[i];
    double r = rhs[i];
    if (t == 'L') d->ucon[i] = r;
    else if (t == 'G') d->lcon[i] = r;
    else { d->lcon[i] = r; d->ucon[i] = r; }
    double rg = range[i];
    if (!std::isnan(rg)) {
      if (t == 'L') d->lcon[i] = d->ucon[i] - std::fabs(rg);
      else if (t == 'G') d->ucon[i] = d->lcon[i] + std::fabs(rg);
      else { if (rg >= 0) d->ucon[i] = r + rg; else d->lcon[i] = r + rg; }
    }
  }
  return d;
}

}  // namespace

extern "C" {

void* mps_parse(const char* text, int64_t len) {
  try {
    return parse_mps_text(text, (size_t)len);
  } catch (...) {
    return nullptr;
  }
}

// Format-aware entry (fixed != 0 -> column-anchored fields); kept separate
// from mps_parse so older .so files stay ABI-compatible with the bindings.
void* mps_parse2(const char* text, int64_t len, int32_t fixed) {
  try {
    return parse_mps_text(text, (size_t)len, fixed != 0);
  } catch (...) {
    return nullptr;
  }
}

int64_t mps_unknown_refs(void* h) {
  return static_cast<MpsData*>(h)->n_unknown;
}

void mps_dims(void* h, int64_t* nvar, int64_t* ncon, int64_t* nnz,
              int64_t* qnnz, int32_t* maximize) {
  auto* d = static_cast<MpsData*>(h);
  *nvar = d->nvar;
  *ncon = d->ncon;
  *nnz = (int64_t)d->A.size();
  *qnnz = (int64_t)d->Q.size();
  *maximize = d->maximize ? 1 : 0;
}

void mps_fill(void* h, int32_t* Ai, int32_t* Aj, double* Ax, double* c,
              double* lvar, double* uvar, double* lcon, double* ucon,
              int32_t* Qi, int32_t* Qj, double* Qx, double* c0,
              uint8_t* integer_mask, char* name, int64_t name_cap) {
  auto* d = static_cast<MpsData*>(h);
  for (size_t k = 0; k < d->A.size(); k++) {
    Ai[k] = d->A[k].i;
    Aj[k] = d->A[k].j;
    Ax[k] = d->A[k].v;
  }
  for (size_t k = 0; k < d->Q.size(); k++) {
    Qi[k] = d->Q[k].i;
    Qj[k] = d->Q[k].j;
    Qx[k] = d->Q[k].v;
  }
  std::memcpy(c, d->c.data(), d->nvar * sizeof(double));
  std::memcpy(lvar, d->lvar.data(), d->nvar * sizeof(double));
  std::memcpy(uvar, d->uvar.data(), d->nvar * sizeof(double));
  std::memcpy(lcon, d->lcon.data(), d->ncon * sizeof(double));
  std::memcpy(ucon, d->ucon.data(), d->ncon * sizeof(double));
  std::memcpy(integer_mask, d->integer_mask.data(), d->nvar);
  *c0 = d->c0;
  std::snprintf(name, name_cap, "%s", d->name.c_str());
}

void mps_free(void* h) { delete static_cast<MpsData*>(h); }

// COO -> CSR counting sort (reference coo_to_csr, src/utils.jl:158-207).
void coo_to_csr(int64_t n_rows, int64_t nnz, const int32_t* Ai,
                const int32_t* Aj, const double* Ax, int32_t* Bp, int32_t* Bj,
                double* Bx) {
  std::memset(Bp, 0, (n_rows + 1) * sizeof(int32_t));
  for (int64_t k = 0; k < nnz; k++) Bp[Ai[k] + 1]++;
  for (int64_t i = 0; i < n_rows; i++) Bp[i + 1] += Bp[i];
  std::vector<int32_t> next(Bp, Bp + n_rows);
  for (int64_t k = 0; k < nnz; k++) {
    int32_t dest = next[Ai[k]]++;
    Bj[dest] = Aj[k];
    Bx[dest] = Ax[k];
  }
}

// ---------------------------------------------------------------------------
// Normal-equation symbolic analysis (reference build_normal_system,
// src/utils.jl:209-274).  Produces the sorted pair list the device
// segment-sum assembly consumes (madipm_tpu/models/sparse.py): for every
// column j of A with nonzero rows r_0 < ... < r_{k-1}, all ordered pairs
// (r_a >= r_b) contribute A[r_a,j]*A[r_b,j]*dinv[j] to S[r_a, r_b].
// ---------------------------------------------------------------------------

namespace {

struct NormalPatternData {
  std::vector<int32_t> pair_a, pair_b, pair_col, seg_id;
  std::vector<int32_t> s_low, s_up;
};

}  // namespace

// Build from CSR(indptr int64[m+1], indices int32[nnz]); K = ELL row width
// (pair_a/pair_b are flat indices row*K + slot into the padded ELL value
// array); m_pad = padded row count (destination keys are i*m_pad+j).
void* normal_pattern_build(int64_t m, int64_t n, int64_t K,
                           const int64_t* indptr, const int32_t* indices,
                           int64_t m_pad) {
  int64_t nnz = indptr[m];
  // CSC bucketing of (row, ell_pos) per column; CSR scan order keeps rows
  // ascending within each column.
  std::vector<int64_t> col_count(n + 1, 0);
  for (int64_t p = 0; p < nnz; p++) col_count[indices[p] + 1]++;
  for (int64_t j = 0; j < n; j++) col_count[j + 1] += col_count[j];
  std::vector<int32_t> csc_row(nnz);
  std::vector<int64_t> csc_ell(nnz);
  {
    std::vector<int64_t> next(col_count.begin(), col_count.end() - 1);
    for (int64_t i = 0; i < m; i++) {
      for (int64_t p = indptr[i]; p < indptr[i + 1]; p++) {
        int32_t j = indices[p];
        int64_t dest = next[j]++;
        csc_row[dest] = (int32_t)i;
        csc_ell[dest] = i * K + (p - indptr[i]);
      }
    }
  }

  int64_t P = 0;
  for (int64_t j = 0; j < n; j++) {
    int64_t k = col_count[j + 1] - col_count[j];
    P += k * (k + 1) / 2;
  }

  auto* d = new NormalPatternData();
  d->pair_a.reserve(P);
  d->pair_b.reserve(P);
  d->pair_col.reserve(P);
  std::vector<int64_t> key(P);
  int64_t q = 0;
  for (int64_t j = 0; j < n; j++) {
    int64_t lo = col_count[j], hi = col_count[j + 1];
    for (int64_t a = lo; a < hi; a++) {
      for (int64_t b = lo; b <= a; b++) {
        d->pair_a.push_back((int32_t)csc_ell[a]);
        d->pair_b.push_back((int32_t)csc_ell[b]);
        d->pair_col.push_back((int32_t)j);
        key[q++] = (int64_t)csc_row[a] * m_pad + csc_row[b];
      }
    }
  }

  // Sort pairs by destination, assign segment ids over unique destinations.
  std::vector<int64_t> order(P);
  for (int64_t i = 0; i < P; i++) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&key](int64_t x, int64_t y) { return key[x] < key[y]; });

  NormalPatternData out;
  out.pair_a.resize(P);
  out.pair_b.resize(P);
  out.pair_col.resize(P);
  out.seg_id.resize(P);
  int64_t prev_key = -1;
  int32_t seg = -1;
  for (int64_t i = 0; i < P; i++) {
    int64_t src = order[i];
    out.pair_a[i] = d->pair_a[src];
    out.pair_b[i] = d->pair_b[src];
    out.pair_col[i] = d->pair_col[src];
    int64_t kk = key[src];
    if (kk != prev_key) {
      seg++;
      prev_key = kk;
      out.s_low.push_back((int32_t)kk);
      int64_t ui = kk / m_pad, uj = kk % m_pad;
      out.s_up.push_back((int32_t)(uj * m_pad + ui));
    }
    out.seg_id[i] = seg;
  }
  *d = std::move(out);
  return d;
}

void normal_pattern_dims(void* h, int64_t* P, int64_t* nnzS) {
  auto* d = static_cast<NormalPatternData*>(h);
  *P = (int64_t)d->pair_a.size();
  *nnzS = (int64_t)d->s_low.size();
}

void normal_pattern_fill(void* h, int32_t* pair_a, int32_t* pair_b,
                         int32_t* pair_col, int32_t* seg_id, int32_t* s_low,
                         int32_t* s_up) {
  auto* d = static_cast<NormalPatternData*>(h);
  std::memcpy(pair_a, d->pair_a.data(), d->pair_a.size() * sizeof(int32_t));
  std::memcpy(pair_b, d->pair_b.data(), d->pair_b.size() * sizeof(int32_t));
  std::memcpy(pair_col, d->pair_col.data(), d->pair_col.size() * sizeof(int32_t));
  std::memcpy(seg_id, d->seg_id.data(), d->seg_id.size() * sizeof(int32_t));
  std::memcpy(s_low, d->s_low.data(), d->s_low.size() * sizeof(int32_t));
  std::memcpy(s_up, d->s_up.data(), d->s_up.size() * sizeof(int32_t));
}

void normal_pattern_free(void* h) { delete static_cast<NormalPatternData*>(h); }

}  // extern "C"
