// Minimal header-only yaml-cpp API shim, just enough to build the
// reference baseline binary (cmd/main_VO.cpp + src/Dataset.cpp are its
// only consumers: LoadFile, operator[], as<string/vector<double>/
// vector<int>>, bool conversion, range-for over sequences, Exception).
// Parses the subset of YAML that the VO config files use: indentation
// maps, block sequences ("- " items incl. "- - " nesting), flow lists
// ([a, b, c] incl. nesting), plain/quoted scalars, '#' comments.
// NOT a general YAML parser - no anchors, no multi-doc, no multiline
// scalars.
#pragma once

#include <cctype>
#include <fstream>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace YAML {

class Exception : public std::runtime_error {
 public:
  explicit Exception(const std::string& m) : std::runtime_error(m) {}
};

namespace detail {

struct NodeData {
  enum Kind { Undefined, Scalar, Sequence, Map } kind = Undefined;
  std::string scalar;
  std::vector<std::shared_ptr<NodeData>> seq;
  std::vector<std::pair<std::string, std::shared_ptr<NodeData>>> map;
};

inline std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

inline std::string unquote(std::string v) {
  if (v.size() >= 2 && ((v.front() == '"' && v.back() == '"') ||
                        (v.front() == '\'' && v.back() == '\'')))
    return v.substr(1, v.size() - 2);
  return v;
}

// strip a trailing comment (outside quotes/brackets)
inline std::string strip_comment(const std::string& s) {
  int depth = 0;
  char q = 0;
  for (size_t i = 0; i < s.size(); ++i) {
    char c = s[i];
    if (q) {
      if (c == q) q = 0;
    } else if (c == '"' || c == '\'') {
      q = c;
    } else if (c == '[') {
      ++depth;
    } else if (c == ']') {
      --depth;
    } else if (c == '#' && depth == 0 &&
               (i == 0 || s[i - 1] == ' ' || s[i - 1] == '\t')) {
      return s.substr(0, i);
    }
  }
  return s;
}

// parse a flow value: "[...]" (recursive) or scalar
inline std::shared_ptr<NodeData> parse_flow(const std::string& text) {
  auto nd = std::make_shared<NodeData>();
  std::string v = strip(text);
  if (!v.empty() && v.front() == '[') {
    if (v.back() != ']') throw Exception("unterminated flow sequence: " + v);
    nd->kind = NodeData::Sequence;
    std::string inner = v.substr(1, v.size() - 2);
    int depth = 0;
    char q = 0;
    std::string cur;
    auto flush = [&]() {
      std::string item = strip(cur);
      cur.clear();
      if (!item.empty()) nd->seq.push_back(parse_flow(item));
    };
    for (char c : inner) {
      if (q) {
        cur += c;
        if (c == q) q = 0;
      } else if (c == '"' || c == '\'') {
        cur += c;
        q = c;
      } else if (c == '[') {
        ++depth;
        cur += c;
      } else if (c == ']') {
        --depth;
        cur += c;
      } else if (c == ',' && depth == 0) {
        flush();
      } else {
        cur += c;
      }
    }
    flush();
    return nd;
  }
  nd->kind = NodeData::Scalar;
  nd->scalar = unquote(v);
  return nd;
}

struct Line {
  int indent;
  std::string text;  // stripped content
};

// parse the block of lines [i, end) whose indent is exactly `indent`
// (children are more-indented). Returns the node; advances i.
inline std::shared_ptr<NodeData> parse_block(const std::vector<Line>& lines,
                                             size_t& i, int indent);

inline std::shared_ptr<NodeData> parse_item_value(
    const std::vector<Line>& lines, size_t& i, int indent,
    const std::string& inline_text) {
  std::string v = strip(inline_text);
  if (!v.empty()) {
    // "- - 1.0" / "- [1, 2]" / "- key: val" (inline nested forms)
    if (v.rfind("- ", 0) == 0 || v == "-") {
      // nested sequence starting on this line: synthesize a sub-block
      std::vector<Line> sub;
      sub.push_back({indent + 2, v});
      while (i < lines.size() && lines[i].indent > indent)
        sub.push_back(lines[i++]);
      size_t j = 0;
      return parse_block(sub, j, indent + 2);
    }
    size_t colon = v.find(": ");
    if (colon == std::string::npos && !v.empty() && v.back() == ':')
      colon = v.size() - 1;
    if (colon != std::string::npos && v.find('[') > colon) {
      std::vector<Line> sub;
      sub.push_back({indent + 2, v});
      while (i < lines.size() && lines[i].indent > indent)
        sub.push_back(lines[i++]);
      size_t j = 0;
      return parse_block(sub, j, indent + 2);
    }
    return parse_flow(v);
  }
  // value is the following more-indented block
  if (i < lines.size() && lines[i].indent > indent) {
    int child_indent = lines[i].indent;
    return parse_block(lines, i, child_indent);
  }
  auto nd = std::make_shared<NodeData>();  // empty value -> Undefined
  return nd;
}

inline std::shared_ptr<NodeData> parse_block(const std::vector<Line>& lines,
                                             size_t& i, int indent) {
  auto nd = std::make_shared<NodeData>();
  bool is_seq = lines[i].text.rfind("- ", 0) == 0 || lines[i].text == "-";
  nd->kind = is_seq ? NodeData::Sequence : NodeData::Map;
  while (i < lines.size() && lines[i].indent == indent) {
    std::string t = lines[i].text;
    if (is_seq) {
      if (!(t.rfind("- ", 0) == 0 || t == "-"))
        break;  // map resumes at this indent (seq was a same-indent child)
      ++i;
      std::string rest = t == "-" ? "" : t.substr(2);
      nd->seq.push_back(parse_item_value(lines, i, indent, rest));
    } else {
      ++i;
      size_t colon = std::string::npos;
      char q = 0;
      for (size_t k = 0; k < t.size(); ++k) {
        char c = t[k];
        if (q) {
          if (c == q) q = 0;
        } else if (c == '"' || c == '\'') {
          q = c;
        } else if (c == ':' &&
                   (k + 1 == t.size() || t[k + 1] == ' ' || t[k + 1] == '\t')) {
          colon = k;
          break;
        }
      }
      if (colon == std::string::npos)
        throw Exception("expected 'key:' near: " + t);
      std::string key = unquote(strip(t.substr(0, colon)));
      std::string val = strip(t.substr(colon + 1));
      std::shared_ptr<NodeData> child;
      if (!val.empty()) {
        child = parse_flow(val);
      } else if (i < lines.size() && lines[i].indent > indent) {
        int ci = lines[i].indent;
        child = parse_block(lines, i, ci);
      } else if (i < lines.size() && lines[i].indent == indent &&
                 (lines[i].text.rfind("- ", 0) == 0 ||
                  lines[i].text == "-")) {
        // block sequence at the same indent as its map key (canonical
        // yaml.safe_dump output)
        child = parse_block(lines, i, indent);
      } else {
        child = std::make_shared<NodeData>();
      }
      nd->map.emplace_back(key, child);
    }
  }
  return nd;
}

template <typename T>
inline T scalar_as(const std::string& s);

template <>
inline std::string scalar_as<std::string>(const std::string& s) {
  return s;
}
template <>
inline double scalar_as<double>(const std::string& s) {
  return std::stod(s);
}
template <>
inline float scalar_as<float>(const std::string& s) {
  return std::stof(s);
}
template <>
inline int scalar_as<int>(const std::string& s) {
  return std::stoi(s);
}
template <>
inline bool scalar_as<bool>(const std::string& s) {
  return s == "true" || s == "True" || s == "1" || s == "yes";
}

template <typename T>
struct AsImpl {
  static T get(const NodeData& d) {
    if (d.kind != NodeData::Scalar)
      throw Exception("as<scalar> on non-scalar node");
    return scalar_as<T>(d.scalar);
  }
};

template <typename U>
struct AsImpl<std::vector<U>> {
  static std::vector<U> get(const NodeData& d) {
    if (d.kind != NodeData::Sequence)
      throw Exception("as<vector> on non-sequence node");
    std::vector<U> out;
    out.reserve(d.seq.size());
    for (auto& e : d.seq) out.push_back(AsImpl<U>::get(*e));
    return out;
  }
};

}  // namespace detail

class Node {
 public:
  Node() : d_(std::make_shared<detail::NodeData>()) {}
  explicit Node(std::shared_ptr<detail::NodeData> d) : d_(std::move(d)) {}

  bool IsDefined() const {
    return d_->kind != detail::NodeData::Undefined;
  }
  explicit operator bool() const { return IsDefined(); }
  bool operator!() const { return !IsDefined(); }

  Node operator[](const std::string& key) const {
    if (d_->kind == detail::NodeData::Map)
      for (auto& kv : d_->map)
        if (kv.first == key) return Node(kv.second);
    return Node();
  }
  Node operator[](const char* key) const {
    return (*this)[std::string(key)];
  }

  template <typename T>
  T as() const {
    return detail::AsImpl<T>::get(*d_);
  }

  size_t size() const { return d_->seq.size(); }

  class const_iterator {
   public:
    const_iterator(const detail::NodeData* d, size_t i) : d_(d), i_(i) {}
    Node operator*() const { return Node(d_->seq[i_]); }
    const_iterator& operator++() {
      ++i_;
      return *this;
    }
    bool operator!=(const const_iterator& o) const { return i_ != o.i_; }

   private:
    const detail::NodeData* d_;
    size_t i_;
  };
  const_iterator begin() const { return const_iterator(d_.get(), 0); }
  const_iterator end() const {
    return const_iterator(d_.get(), d_->seq.size());
  }

 private:
  std::shared_ptr<detail::NodeData> d_;
};

inline Node LoadFile(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw Exception("cannot open " + path);
  std::vector<detail::Line> lines;
  std::string raw;
  while (std::getline(f, raw)) {
    std::string noc = detail::strip_comment(raw);
    std::string body = detail::strip(noc);
    if (body.empty() || body == "---") continue;
    int ind = 0;
    while (ind < (int)noc.size() && noc[ind] == ' ') ++ind;
    lines.push_back({ind, body});
  }
  if (lines.empty()) return Node();
  size_t i = 0;
  return Node(detail::parse_block(lines, i, lines[0].indent));
}

}  // namespace YAML
