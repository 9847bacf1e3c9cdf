// isclm — in-tree trigram language model tool, the TPU build's stand-in for
// SRILM's ngram-count / ngram binaries (reference preprocess.py:426-439
// trains per-sentiment trigram LMs with `ngram-count -order 3 -interpolate
// -kndiscount`; eval_ppl.py:8 scores with `ngram -ppl`).
//
//   isclm train <text> <out.arpa>   interpolated modified-Kneser-Ney
//                                   trigram, ARPA output (readable by
//                                   SRILM/KenLM tooling)
//   isclm ppl <lm.arpa> <text>      perplexity with SRILM conventions:
//                                   sentences wrapped in <s> ... </s>, OOV
//                                   words skipped and reported, ppl over
//                                   (words - OOVs + sentences)
//
// Output line format mirrors `ngram -ppl`:
//   0 zeroprobs, logprob= X ppl= Y ppl1= Z
#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr const char* kBOS = "<s>";
constexpr const char* kEOS = "</s>";
constexpr double kLog10Min = -99.0;

std::vector<std::string> SplitWs(const std::string& line) {
  std::vector<std::string> out;
  std::istringstream is(line);
  std::string w;
  while (is >> w) out.push_back(w);
  return out;
}

// ----------------------------------------------------------------------
// Training: interpolated modified Kneser-Ney (Chen & Goodman 1998), the
// estimator behind SRILM's -kndiscount -interpolate.
// ----------------------------------------------------------------------

struct Counts {
  // order-indexed ngram -> count; keys are space-joined word ids
  std::unordered_map<std::string, uint64_t> c[3];
  // continuation counts for lower orders: N1+(* ngram)
  std::unordered_map<std::string, uint64_t> cont[2];  // [0]=uni, [1]=bi
};

struct Discounts {
  double d1 = 0.5, d2 = 0.75, d3 = 1.0;
};

Discounts EstimateDiscounts(const std::unordered_map<std::string, uint64_t>& c) {
  uint64_t n1 = 0, n2 = 0, n3 = 0, n4 = 0;
  for (const auto& kv : c) {
    if (kv.second == 1) n1++;
    else if (kv.second == 2) n2++;
    else if (kv.second == 3) n3++;
    else if (kv.second == 4) n4++;
  }
  Discounts d;
  if (n1 > 0 && n2 > 0) {
    double y = double(n1) / double(n1 + 2 * n2);
    d.d1 = std::max(0.0, 1.0 - 2.0 * y * double(n2) / double(n1));
    d.d2 = n3 ? std::max(0.0, 2.0 - 3.0 * y * double(n3) / double(n2))
              : 2.0 * d.d1;
    d.d3 = (n3 && n4) ? std::max(0.0, 3.0 - 4.0 * y * double(n4) / double(n3))
                      : (d.d2 > 0 ? 1.5 * d.d2 : 1.0);
  }
  // clamp into sane range for tiny corpora
  d.d1 = std::min(d.d1, 0.99);
  d.d2 = std::min(d.d2, 1.99);
  d.d3 = std::min(d.d3, 2.99);
  if (d.d1 <= 0) d.d1 = 0.5;
  if (d.d2 <= 0) d.d2 = 0.75;
  if (d.d3 <= 0) d.d3 = 1.0;
  return d;
}

double Discount(const Discounts& d, uint64_t c) {
  if (c == 0) return 0.0;
  if (c == 1) return d.d1;
  if (c == 2) return d.d2;
  return d.d3;
}

struct Arpa {
  // ngram -> {log10 prob, log10 backoff (only for orders < max)}
  std::map<std::string, std::pair<double, double>> grams[3];
};

int Train(const char* text_path, const char* out_path) {
  std::ifstream in(text_path);
  if (!in) { std::cerr << "cannot open " << text_path << "\n"; return 1; }

  Counts cnt;
  std::string line;
  uint64_t n_sents = 0;
  while (std::getline(in, line)) {
    auto words = SplitWs(line);
    if (words.empty()) continue;
    n_sents++;
    std::vector<std::string> s;
    s.push_back(kBOS);
    for (auto& w : words) s.push_back(w);
    s.push_back(kEOS);
    for (size_t i = 0; i < s.size(); i++) {
      if (i >= 1 || s[i] != kBOS) cnt.c[0][s[i]]++;  // unigrams (skip <s>? no: count it but never predict it)
      if (i + 1 < s.size()) cnt.c[1][s[i] + " " + s[i + 1]]++;
      if (i + 2 < s.size())
        cnt.c[2][s[i] + " " + s[i + 1] + " " + s[i + 2]]++;
    }
  }
  if (n_sents == 0) { std::cerr << "empty corpus\n"; return 1; }

  // continuation counts: for each distinct trigram (a b c), cont bigram
  // (b c)++; for each distinct bigram (a b), cont unigram (b)++.
  // right-extension counts: distinct successors per context.
  for (const auto& kv : cnt.c[2]) {
    auto ws = SplitWs(kv.first);
    cnt.cont[1][ws[1] + " " + ws[2]]++;
  }
  for (const auto& kv : cnt.c[1]) {
    auto ws = SplitWs(kv.first);
    cnt.cont[0][ws[1]]++;
  }

  // modified-KN bigram counts: continuation counts N1+(* a b), except
  // contexts starting with <s> where raw counts stay (Chen & Goodman —
  // <s> can never be a continuation, so its bigrams would vanish)
  std::unordered_map<std::string, uint64_t> bi_kn;
  for (const auto& kv : cnt.c[1]) {
    auto ws = SplitWs(kv.first);
    if (ws[0] == kBOS) {
      bi_kn[kv.first] = kv.second;
    } else {
      auto it = cnt.cont[1].find(kv.first);
      if (it != cnt.cont[1].end()) bi_kn[kv.first] = it->second;
    }
  }

  Discounts d3 = EstimateDiscounts(cnt.c[2]);
  Discounts d2 = EstimateDiscounts(bi_kn);

  // ---- unigram distribution from continuation counts (KN) ----
  uint64_t total_cont = 0;
  for (const auto& kv : cnt.cont[0]) total_cont += kv.second;
  // vocabulary = all unigram types (incl </s>, excl <s> for prediction)
  std::vector<std::string> vocab;
  for (const auto& kv : cnt.c[0]) vocab.push_back(kv.first);
  std::sort(vocab.begin(), vocab.end());
  size_t V = vocab.size();

  Arpa arpa;
  // uniform interpolation floor so unseen-in-continuation words (e.g. only
  // ever after <s>) keep mass; SRILM handles this with its own smoothing —
  // a small epsilon mix keeps probs proper and ppl finite.
  const double eps = 1e-10;
  double uni_norm = double(total_cont) + 1.0;  // +1 for the eps mass pool
  for (const auto& w : vocab) {
    double p;
    auto it = cnt.cont[0].find(w);
    double cc = it == cnt.cont[0].end() ? 0.0 : double(it->second);
    p = (cc + 1.0 / double(V)) / uni_norm;
    p = std::max(p, eps);
    arpa.grams[0][w] = {std::log10(p), 0.0};
  }
  // <s>: prob is conventionally -99 (never predicted), carries backoff
  arpa.grams[0][kBOS] = {kLog10Min, 0.0};

  auto uni_p = [&](const std::string& w) {
    auto it = arpa.grams[0].find(w);
    return it == arpa.grams[0].end() ? eps
                                     : std::pow(10.0, it->second.first);
  };

  // ---- bigrams: interpolated modified-KN over continuation counts ----
  // context totals for bigrams
  std::unordered_map<std::string, uint64_t> uni_ctx_total;
  std::unordered_map<std::string, std::array<uint64_t, 3>> uni_ctx_nn;
  for (const auto& kv : bi_kn) {
    auto ws = SplitWs(kv.first);
    uni_ctx_total[ws[0]] += kv.second;
    auto& nn = uni_ctx_nn[ws[0]];
    if (kv.second == 1) nn[0]++;
    else if (kv.second == 2) nn[1]++;
    else nn[2]++;
  }
  for (const auto& kv : bi_kn) {
    auto ws = SplitWs(kv.first);
    double tot = double(uni_ctx_total[ws[0]]);
    double disc = Discount(d2, kv.second);
    const auto& nn = uni_ctx_nn[ws[0]];
    double gamma = (d2.d1 * nn[0] + d2.d2 * nn[1] + d2.d3 * nn[2]) / tot;
    double p = (double(kv.second) - disc) / tot + gamma * uni_p(ws[1]);
    arpa.grams[1][kv.first] = {std::log10(std::max(p, eps)), 0.0};
  }
  // bigram context backoff weights attach to the *unigram* entries
  for (auto& kv : arpa.grams[0]) {
    auto it = uni_ctx_total.find(kv.first);
    if (it == uni_ctx_total.end()) continue;
    const auto& nn = uni_ctx_nn[kv.first];
    double gamma =
        (d2.d1 * nn[0] + d2.d2 * nn[1] + d2.d3 * nn[2]) / double(it->second);
    kv.second.second = std::log10(std::max(gamma, eps));
  }

  auto bi_logp = [&](const std::string& a, const std::string& b) {
    auto it = arpa.grams[1].find(a + " " + b);
    if (it != arpa.grams[1].end()) return it->second.first;
    auto u = arpa.grams[0].find(a);
    double bo = u == arpa.grams[0].end() ? 0.0 : u->second.second;
    return bo + std::log10(std::max(uni_p(b), eps));
  };

  // ---- trigrams ----
  std::unordered_map<std::string, uint64_t> bi_ctx_total;
  std::unordered_map<std::string, std::array<uint64_t, 3>> bi_ctx_nn;
  for (const auto& kv : cnt.c[2]) {
    auto ws = SplitWs(kv.first);
    std::string ctx = ws[0] + " " + ws[1];
    bi_ctx_total[ctx] += kv.second;
    auto& nn = bi_ctx_nn[ctx];
    if (kv.second == 1) nn[0]++;
    else if (kv.second == 2) nn[1]++;
    else nn[2]++;
  }
  for (const auto& kv : cnt.c[2]) {
    auto ws = SplitWs(kv.first);
    std::string ctx = ws[0] + " " + ws[1];
    double tot = double(bi_ctx_total[ctx]);
    double disc = Discount(d3, kv.second);
    const auto& nn = bi_ctx_nn[ctx];
    double gamma = (d3.d1 * nn[0] + d3.d2 * nn[1] + d3.d3 * nn[2]) / tot;
    double p = (double(kv.second) - disc) / tot +
               gamma * std::pow(10.0, bi_logp(ws[1], ws[2]));
    arpa.grams[2][kv.first] = {std::log10(std::max(p, eps)), 0.0};
  }
  // trigram context backoffs attach to bigram entries
  for (auto& kv : arpa.grams[1]) {
    auto it = bi_ctx_total.find(kv.first);
    if (it == bi_ctx_total.end()) continue;
    const auto& nn = bi_ctx_nn[kv.first];
    double gamma =
        (d3.d1 * nn[0] + d3.d2 * nn[1] + d3.d3 * nn[2]) / double(it->second);
    kv.second.second = std::log10(std::max(gamma, eps));
  }

  // ---- ARPA out ----
  std::ofstream out(out_path);
  if (!out) { std::cerr << "cannot write " << out_path << "\n"; return 1; }
  out << "\n\\data\\\n";
  for (int o = 0; o < 3; o++)
    out << "ngram " << (o + 1) << "=" << arpa.grams[o].size() << "\n";
  char buf[512];
  for (int o = 0; o < 3; o++) {
    out << "\n\\" << (o + 1) << "-grams:\n";
    for (const auto& kv : arpa.grams[o]) {
      if (o < 2 && kv.second.second != 0.0) {
        snprintf(buf, sizeof buf, "%.7f\t%s\t%.7f", kv.second.first,
                 kv.first.c_str(), kv.second.second);
      } else {
        snprintf(buf, sizeof buf, "%.7f\t%s", kv.second.first,
                 kv.first.c_str());
      }
      out << buf << "\n";
    }
  }
  out << "\n\\end\\\n";
  return 0;
}

// ----------------------------------------------------------------------
// Scoring: ARPA reader + backoff ppl, SRILM `ngram -ppl` conventions.
// ----------------------------------------------------------------------

struct Lm {
  int order = 0;
  std::unordered_map<std::string, std::pair<double, double>> grams[9];
};

bool LoadArpa(const char* path, Lm* lm) {
  std::ifstream in(path);
  if (!in) return false;
  std::string line;
  int cur = -1;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    if (line[0] == '\\') {
      if (line.rfind("\\end", 0) == 0) break;
      size_t dash = line.find("-grams:");
      if (dash != std::string::npos) {
        cur = std::atoi(line.c_str() + 1) - 1;
        if (cur < 0 || cur >= 9) {
          std::cerr << "unsupported LM order " << (cur + 1)
                    << " (max 9)\n";
          return false;
        }
        lm->order = std::max(lm->order, cur + 1);
      }
      continue;
    }
    if (cur < 0) continue;
    // prob \t ngram [\t backoff]
    std::istringstream is(line);
    double logp;
    if (!(is >> logp)) continue;
    std::vector<std::string> ws;
    std::string tok;
    while (is >> tok) ws.push_back(tok);
    double bo = 0.0;
    int n = cur + 1;
    if ((int)ws.size() == n + 1) {
      bo = std::atof(ws.back().c_str());
      ws.pop_back();
    }
    if ((int)ws.size() != n) continue;
    std::string key = ws[0];
    for (int i = 1; i < n; i++) key += " " + ws[i];
    lm->grams[cur][key] = {logp, bo};
  }
  return lm->order > 0;
}

// log10 P(w | context) with standard ARPA backoff
double LogProb(const Lm& lm, const std::vector<std::string>& ctx,
               const std::string& w, bool* oov) {
  *oov = false;
  if (lm.grams[0].find(w) == lm.grams[0].end()) { *oov = true; return 0.0; }
  int max_n = std::min<int>(lm.order, (int)ctx.size() + 1);
  for (int n = max_n; n >= 1; n--) {
    std::string key;
    for (int i = (int)ctx.size() - (n - 1); i < (int)ctx.size(); i++)
      key += ctx[i] + " ";
    key += w;
    auto it = lm.grams[n - 1].find(key);
    if (it != lm.grams[n - 1].end()) {
      double lp = it->second.first;
      if (lp <= kLog10Min) { *oov = true; return 0.0; }  // <s> style
      return lp;
    }
    // accumulate backoff of the context at order n-1
    if (n > 1) {
      std::string ckey;
      for (int i = (int)ctx.size() - (n - 1); i < (int)ctx.size(); i++) {
        if (!ckey.empty()) ckey += " ";
        ckey += ctx[i];
      }
      auto cit = lm.grams[n - 2].find(ckey);
      if (cit != lm.grams[n - 2].end()) {
        // recurse manually: backoff weight + lower-order estimate
        std::vector<std::string> sub(ctx.end() - (n - 2), ctx.end());
        bool sub_oov = false;
        double lower = LogProb(lm, sub, w, &sub_oov);
        if (sub_oov) { *oov = true; return 0.0; }
        return cit->second.second + lower;
      }
      // context unseen: plain backoff (weight 0)
      continue;
    }
  }
  *oov = true;
  return 0.0;
}

int Ppl(const char* lm_path, const char* text_path) {
  Lm lm;
  if (!LoadArpa(lm_path, &lm)) {
    std::cerr << "cannot load LM " << lm_path << "\n";
    return 1;
  }
  std::ifstream in(text_path);
  if (!in) { std::cerr << "cannot open " << text_path << "\n"; return 1; }

  double logprob = 0.0;
  uint64_t words = 0, oovs = 0, sents = 0, zeroprobs = 0;
  std::string line;
  while (std::getline(in, line)) {
    auto ws = SplitWs(line);
    if (ws.empty()) continue;
    sents++;
    std::vector<std::string> ctx = {kBOS};
    for (size_t i = 0; i <= ws.size(); i++) {
      std::string w = i < ws.size() ? ws[i] : kEOS;
      bool oov = false;
      double lp = LogProb(lm, ctx, w, &oov);
      if (i < ws.size()) words++;
      if (oov) {
        oovs++;
      } else {
        logprob += lp;
      }
      ctx.push_back(w);
      if ((int)ctx.size() > lm.order - 1 && lm.order > 1)
        ctx.erase(ctx.begin(),
                  ctx.end() - (lm.order - 1));
    }
  }
  double denom = double(words) - double(oovs) + double(sents);
  double denom1 = double(words) - double(oovs);
  double ppl = denom > 0 ? std::pow(10.0, -logprob / denom) : 0.0;
  double ppl1 = denom1 > 0 ? std::pow(10.0, -logprob / denom1) : 0.0;
  printf("file %s: %llu sentences, %llu words, %llu OOVs\n", text_path,
         (unsigned long long)sents, (unsigned long long)words,
         (unsigned long long)oovs);
  printf("%llu zeroprobs, logprob= %.4f ppl= %.4f ppl1= %.4f\n",
         (unsigned long long)zeroprobs, logprob, ppl, ppl1);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc == 4 && !strcmp(argv[1], "train"))
    return Train(argv[2], argv[3]);
  if (argc == 4 && !strcmp(argv[1], "ppl"))
    return Ppl(argv[2], argv[3]);
  std::cerr << "usage: isclm train <text> <out.arpa> | "
               "isclm ppl <lm.arpa> <text>\n";
  return 2;
}
