// kitti_eval — offline KITTI 3D/BEV/2D AP evaluator (TPU-native rebuild).
//
// Capability parity target: the reference's devkit-derived
// `train/kitti_eval/evaluate_object_3d_offline.cpp` (SURVEY.md N4):
// reads a ground-truth label directory and a result directory (KITTI
// label format), applies the devkit difficulty rules, and reports
// 2D / bird's-eye-view / 3D average precision per class & difficulty.
// Reimplemented from the published devkit semantics in plain C++17 —
// no boost, no OpenCV (the devkit used boost::geometry for the rotated
// polygon clip; here it is Sutherland–Hodgman, same as core/box_np.py).
//
// Devkit rules implemented:
//   * difficulties (min 2D height px, max occlusion, max truncation):
//       easy (40, 0, 0.15)  moderate (25, 1, 0.30)  hard (25, 2, 0.50)
//   * min overlap: car 0.7 (2D/BEV/3D), pedestrian/cyclist 0.5
//   * neighboring-class ignores: Van ~ Car, Person_sitting ~ Pedestrian,
//     plus DontCare regions
//   * score thresholds at N_SAMPLE_PTS=41 recall points from the sorted
//     true-positive scores; precision curve max-right interpolated;
//     AP = mean over the 41 points (R11-style devkit metric) and the
//     R40 variant (mean over points 1..40) reported alongside.
//
// Usage: kitti_eval <gt_dir> <result_dir> [<list_file>]
//   gt_dir:     directory of ground-truth label files (<frame>.txt)
//   result_dir: directory with detection files under data/<frame>.txt
//   list_file:  optional file of frame ids; default = all GT files
// Output: per-class, per-metric AP table on stdout and
//         <result_dir>/stats_<class>_ap.txt files.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

constexpr int N_SAMPLE_PTS = 41;

enum Difficulty { EASY = 0, MODERATE = 1, HARD = 2 };
const char* kDifficultyNames[3] = {"easy", "moderate", "hard"};
const double kMinHeight[3] = {40.0, 25.0, 25.0};
const int kMaxOcclusion[3] = {0, 1, 2};
const double kMaxTruncation[3] = {0.15, 0.30, 0.50};

enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };
const char* kMetricNames[3] = {"2d", "bev", "3d"};

struct Box {
  std::string type;
  double truncation = 0, occlusion = 0, alpha = 0;
  double x1 = 0, y1 = 0, x2 = 0, y2 = 0;     // 2D box
  double h = 0, w = 0, l = 0;                 // size
  double x = 0, y = 0, z = 0;                 // bottom-center, rect frame
  double ry = 0;
  double score = 0;
};

struct ClassSpec {
  std::string name;
  std::vector<std::string> neighbors;  // ignored lookalikes
  double min_overlap;
};

const std::vector<ClassSpec> kClasses = {
    {"Car", {"Van"}, 0.7},
    {"Pedestrian", {"Person_sitting"}, 0.5},
    {"Cyclist", {}, 0.5},
};

std::vector<Box> ReadLabelFile(const std::string& path) {
  std::vector<Box> boxes;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    Box b;
    ss >> b.type >> b.truncation >> b.occlusion >> b.alpha >> b.x1 >>
        b.y1 >> b.x2 >> b.y2 >> b.h >> b.w >> b.l >> b.x >> b.y >> b.z >>
        b.ry;
    if (!(ss >> b.score)) b.score = 1.0;
    boxes.push_back(b);
  }
  return boxes;
}

bool IEquals(const std::string& a, const std::string& b) {
  if (a.size() != b.size()) return false;
  for (size_t i = 0; i < a.size(); ++i)
    if (tolower(a[i]) != tolower(b[i])) return false;
  return true;
}

// ---------------------------------------------------------------------
// Geometry
// ---------------------------------------------------------------------

struct Pt {
  double x, z;
};

// BEV polygon of a rotated box (bottom-center x,z; yaw ry about Y).
std::vector<Pt> BevPolygon(const Box& b) {
  const double c = std::cos(b.ry), s = std::sin(b.ry);
  // Corner pattern (+l/2,+w/2), (+,-), (-,-), (-,+) rotated by ry:
  // rect-camera +Y rotation maps (x,z) -> (c*x + s*z, -s*x + c*z).
  std::vector<Pt> poly;
  const double hx[4] = {+b.l / 2, +b.l / 2, -b.l / 2, -b.l / 2};
  const double hz[4] = {+b.w / 2, -b.w / 2, -b.w / 2, +b.w / 2};
  for (int i = 0; i < 4; ++i) {
    poly.push_back(
        {b.x + c * hx[i] + s * hz[i], b.z - s * hx[i] + c * hz[i]});
  }
  return poly;
}

double PolyArea(const std::vector<Pt>& p) {
  double a = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % p.size()];
    a += u.x * v.z - v.x * u.z;
  }
  return std::fabs(a) / 2.0;
}

// Sutherland–Hodgman clip of subject by convex clip polygon.
std::vector<Pt> PolyClip(std::vector<Pt> subject,
                         const std::vector<Pt>& clip) {
  // Ensure counter-clockwise clip ordering via signed area.
  std::vector<Pt> cl = clip;
  double signed_area = 0;
  for (size_t i = 0; i < cl.size(); ++i) {
    const Pt& u = cl[i];
    const Pt& v = cl[(i + 1) % cl.size()];
    signed_area += u.x * v.z - v.x * u.z;
  }
  if (signed_area < 0) std::reverse(cl.begin(), cl.end());

  auto inside = [](const Pt& p, const Pt& a, const Pt& b) {
    return (b.x - a.x) * (p.z - a.z) - (b.z - a.z) * (p.x - a.x) >= 0;
  };
  auto intersect = [](const Pt& p, const Pt& q, const Pt& a, const Pt& b) {
    const double a1 = q.z - p.z, b1 = p.x - q.x,
                 c1 = a1 * p.x + b1 * p.z;
    const double a2 = b.z - a.z, b2 = a.x - b.x,
                 c2 = a2 * a.x + b2 * a.z;
    const double det = a1 * b2 - a2 * b1;
    if (std::fabs(det) < 1e-12) return q;
    return Pt{(b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det};
  };

  std::vector<Pt> output = subject;
  for (size_t e = 0; e < cl.size() && !output.empty(); ++e) {
    const Pt& a = cl[e];
    const Pt& b = cl[(e + 1) % cl.size()];
    std::vector<Pt> input;
    input.swap(output);
    for (size_t i = 0; i < input.size(); ++i) {
      const Pt& p = input[(i + input.size() - 1) % input.size()];
      const Pt& q = input[i];
      const bool qin = inside(q, a, b), pin = inside(p, a, b);
      if (qin) {
        if (!pin) output.push_back(intersect(p, q, a, b));
        output.push_back(q);
      } else if (pin) {
        output.push_back(intersect(p, q, a, b));
      }
    }
  }
  return output;
}

double Overlap2D(const Box& a, const Box& b) {
  const double ix = std::max(
      0.0, std::min(a.x2, b.x2) - std::max(a.x1, b.x1));
  const double iy = std::max(
      0.0, std::min(a.y2, b.y2) - std::max(a.y1, b.y1));
  const double inter = ix * iy;
  const double ua = (a.x2 - a.x1) * (a.y2 - a.y1) +
                    (b.x2 - b.x1) * (b.y2 - b.y1) - inter;
  return ua > 0 ? inter / ua : 0;
}

double OverlapBev(const Box& a, const Box& b) {
  auto pa = BevPolygon(a), pb = BevPolygon(b);
  auto inter = PolyClip(pa, pb);
  if (inter.empty()) return 0;
  const double ia = PolyArea(inter);
  const double ua = a.l * a.w + b.l * b.w - ia;
  return ua > 0 ? ia / ua : 0;
}

double Overlap3D(const Box& a, const Box& b) {
  auto pa = BevPolygon(a), pb = BevPolygon(b);
  auto inter = PolyClip(pa, pb);
  if (inter.empty()) return 0;
  const double ia = PolyArea(inter);
  // y is the box bottom; boxes span [y-h, y].
  const double ymin = std::max(a.y - a.h, b.y - b.h);
  const double ymax = std::min(a.y, b.y);
  const double ih = std::max(0.0, ymax - ymin);
  const double iv = ia * ih;
  const double uv = a.l * a.w * a.h + b.l * b.w * b.h - iv;
  return uv > 0 ? iv / uv : 0;
}

double Overlap(Metric m, const Box& a, const Box& b) {
  switch (m) {
    case IMAGE: return Overlap2D(a, b);
    case GROUND: return OverlapBev(a, b);
    default: return Overlap3D(a, b);
  }
}

// ---------------------------------------------------------------------
// Devkit evaluation logic
// ---------------------------------------------------------------------

// GT assignment classes: 1 = valid, 0 = ignored, -1 = other class.
struct FrameData {
  std::vector<Box> gt, det;
  std::vector<int> gt_kind;    // per GT: 1 valid / 0 ignored / -1 other
  std::vector<bool> det_same;  // det of the evaluated class
  std::vector<Box> dontcare;
};

void ClassifyGt(const ClassSpec& cls, Difficulty dif, FrameData* fd) {
  fd->gt_kind.resize(fd->gt.size());
  for (size_t i = 0; i < fd->gt.size(); ++i) {
    const Box& g = fd->gt[i];
    const double height = g.y2 - g.y1;
    int kind;
    if (IEquals(g.type, cls.name)) {
      const bool valid = g.occlusion <= kMaxOcclusion[dif] &&
                         g.truncation <= kMaxTruncation[dif] &&
                         height >= kMinHeight[dif];
      kind = valid ? 1 : 0;  // wrong difficulty -> ignored
    } else {
      bool neighbor = false;
      for (const auto& nb : cls.neighbors)
        if (IEquals(g.type, nb)) neighbor = true;
      kind = neighbor ? 0 : -1;
    }
    fd->gt_kind[i] = kind;
  }
  fd->det_same.resize(fd->det.size());
  for (size_t i = 0; i < fd->det.size(); ++i)
    fd->det_same[i] = IEquals(fd->det[i].type, cls.name);
}

// One pass over a frame at a score threshold. When collect_tp_scores is
// set, instead gathers the scores of matched valid GT (threshold pass
// with thresh=-inf) for threshold selection.
struct PrCount {
  double tp = 0, fp = 0, fn = 0;
};

void EvalFrame(const ClassSpec& cls, Metric metric, const FrameData& fd,
               double thresh, PrCount* pr,
               std::vector<double>* collect_tp_scores) {
  const size_t ng = fd.gt.size(), nd = fd.det.size();
  std::vector<bool> gt_matched(ng, false), det_assigned(nd, false),
      det_ignored(nd, false);

  // Greedy: each valid GT takes its best-overlap detection above thresh
  // (devkit iterates GT and picks max-overlap det).
  for (size_t i = 0; i < ng; ++i) {
    if (fd.gt_kind[i] != 1) continue;
    int best = -1;
    double best_ov = cls.min_overlap;
    for (size_t j = 0; j < nd; ++j) {
      if (!fd.det_same[j] || det_assigned[j]) continue;
      if (fd.det[j].score < thresh) continue;
      const double ov = Overlap(metric, fd.gt[i], fd.det[j]);
      if (ov >= best_ov) {
        best_ov = ov;
        best = static_cast<int>(j);
      }
    }
    if (best >= 0) {
      gt_matched[i] = true;
      det_assigned[best] = true;
      pr->tp += 1;
      if (collect_tp_scores)
        collect_tp_scores->push_back(fd.det[best].score);
    } else {
      pr->fn += 1;
    }
  }
  // Detections matching ignored GT (wrong difficulty / neighbor class)
  // or DontCare regions do not count as FP.
  for (size_t j = 0; j < nd; ++j) {
    if (!fd.det_same[j] || det_assigned[j]) continue;
    if (fd.det[j].score < thresh) continue;
    bool ignored = false;
    for (size_t i = 0; i < ng && !ignored; ++i) {
      if (fd.gt_kind[i] != 0) continue;
      if (Overlap(metric, fd.gt[i], fd.det[j]) >= cls.min_overlap)
        ignored = true;
    }
    for (size_t i = 0; i < fd.dontcare.size() && !ignored; ++i) {
      // DontCare: 2D containment test (devkit uses 2D overlap-over-det).
      const Box& dc = fd.dontcare[i];
      const Box& d = fd.det[j];
      const double ix = std::max(
          0.0, std::min(d.x2, dc.x2) - std::max(d.x1, dc.x1));
      const double iy = std::max(
          0.0, std::min(d.y2, dc.y2) - std::max(d.y1, dc.y1));
      const double da = (d.x2 - d.x1) * (d.y2 - d.y1);
      if (da > 0 && ix * iy / da >= cls.min_overlap) ignored = true;
    }
    if (ignored) det_ignored[j] = true;
    else pr->fp += 1;
  }
}

std::vector<double> Thresholds(std::vector<double> tp_scores,
                               double total_valid_gt) {
  std::sort(tp_scores.begin(), tp_scores.end(),
            std::greater<double>());
  std::vector<double> t;
  double current_recall = 0;
  for (size_t i = 0; i < tp_scores.size(); ++i) {
    const double l_recall = (i + 1) / total_valid_gt;
    const double r_recall =
        i + 1 < tp_scores.size() ? (i + 2) / total_valid_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i + 1 < tp_scores.size())
      continue;
    t.push_back(tp_scores[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

struct ApResult {
  double ap_r11 = 0, ap_r40 = 0;
  std::vector<double> precision;  // at the 41 sample points
};

ApResult EvalClassMetric(const ClassSpec& cls, Metric metric,
                         Difficulty dif,
                         std::vector<FrameData>& frames) {
  for (auto& fd : frames) ClassifyGt(cls, dif, &fd);

  // Pass 1: total valid GT + TP scores with no threshold.
  double total_gt = 0;
  std::vector<double> tp_scores;
  for (auto& fd : frames) {
    for (int k : fd.gt_kind) total_gt += (k == 1);
    PrCount pr;
    EvalFrame(cls, metric, fd, -1e18, &pr, &tp_scores);
  }
  ApResult res;
  res.precision.assign(N_SAMPLE_PTS, 0.0);
  if (total_gt == 0) return res;

  const auto thresholds = Thresholds(tp_scores, total_gt);
  // Pass 2: PR at each threshold.
  for (size_t t = 0; t < thresholds.size(); ++t) {
    PrCount pr;
    for (auto& fd : frames)
      EvalFrame(cls, metric, fd, thresholds[t], &pr, nullptr);
    if (pr.tp + pr.fp > 0)
      res.precision[t] = pr.tp / (pr.tp + pr.fp);
  }
  // Max-right interpolation.
  for (int i = N_SAMPLE_PTS - 2; i >= 0; --i)
    res.precision[i] = std::max(res.precision[i], res.precision[i + 1]);
  double s11 = 0, s40 = 0;
  for (int i = 0; i < N_SAMPLE_PTS; ++i) {
    if (i % 4 == 0) s11 += res.precision[i];  // 11 of the 41 points
    if (i > 0) s40 += res.precision[i];
  }
  res.ap_r11 = s11 / 11.0 * 100.0;
  res.ap_r40 = s40 / 40.0 * 100.0;
  return res;
}

std::vector<std::string> ListFrames(const std::string& gt_dir,
                                    const std::string& list_file) {
  std::vector<std::string> ids;
  if (!list_file.empty()) {
    std::ifstream f(list_file);
    std::string line;
    while (std::getline(f, line))
      if (!line.empty()) ids.push_back(line);
    return ids;
  }
  DIR* d = opendir(gt_dir.c_str());
  if (!d) return ids;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".txt")
      ids.push_back(name.substr(0, name.size() - 4));
  }
  closedir(d);
  std::sort(ids.begin(), ids.end());
  return ids;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <gt_dir> <result_dir> [<list_file>]\n",
                 argv[0]);
    return 2;
  }
  const std::string gt_dir = argv[1], result_dir = argv[2];
  const std::string list_file = argc > 3 ? argv[3] : "";

  const auto ids = ListFrames(gt_dir, list_file);
  if (ids.empty()) {
    std::fprintf(stderr, "no ground-truth frames found in %s\n",
                 gt_dir.c_str());
    return 2;
  }

  std::vector<FrameData> frames(ids.size());
  for (size_t i = 0; i < ids.size(); ++i) {
    auto gt = ReadLabelFile(gt_dir + "/" + ids[i] + ".txt");
    for (auto& g : gt) {
      if (IEquals(g.type, "DontCare")) frames[i].dontcare.push_back(g);
      else frames[i].gt.push_back(g);
    }
    frames[i].det = ReadLabelFile(result_dir + "/data/" + ids[i] + ".txt");
  }

  std::printf("evaluating %zu frames\n", ids.size());
  // PR-curve data directory (devkit-style plot/<class>_<metric>.txt:
  // one row per recall sample point, columns = recall then the
  // precision for easy/moderate/hard — consumable by gnuplot/numpy).
  const std::string plot_dir = result_dir + "/plot";
  ::mkdir(plot_dir.c_str(), 0755);
  for (const auto& cls : kClasses) {
    std::string lower = cls.name;
    lower[0] = tolower(lower[0]);
    std::ofstream stats(result_dir + "/stats_" + lower + "_ap.txt");
    for (int m = 0; m < 3; ++m) {
      std::printf("%s AP(%s) @%.2f:", cls.name.c_str(), kMetricNames[m],
                  cls.min_overlap);
      stats << cls.name << " " << kMetricNames[m];
      ApResult per_diff[3];
      for (int d = 0; d < 3; ++d) {
        auto res = EvalClassMetric(cls, static_cast<Metric>(m),
                                   static_cast<Difficulty>(d), frames);
        per_diff[d] = res;
        std::printf(" %s=%.2f/%.2f", kDifficultyNames[d], res.ap_r11,
                    res.ap_r40);
        stats << " " << res.ap_r11;
      }
      std::printf("  (R11/R40)\n");
      stats << "\n";
      std::ofstream plot(plot_dir + "/" + lower + "_" +
                         kMetricNames[m] + ".txt");
      for (int i = 0; i < N_SAMPLE_PTS; ++i) {
        plot << (i / (N_SAMPLE_PTS - 1.0));
        for (int d = 0; d < 3; ++d)
          plot << " " << per_diff[d].precision[i];
        plot << "\n";
      }
    }
  }
  return 0;
}
