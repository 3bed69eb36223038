// gsl_client.hpp — C++ GSL serving client for graph_learn_tpu's online tier.
//
// Second-language consumer of the JSON query-plan wire format
// (graph_learn_tpu/gsl/plan.py), proving the protocol is language-neutral.
// Capability parity with the reference's Java GSL client
// (reference: dynamic_graph_service/gsl_client/src/main/java/org/aliyun/
//  gsl_client/Traversal.java:28-167 fluent builder, parser/Plan.java JSON
//  plan, http/HttpClient.java transport) — but speaking this framework's
// plan JSON over plain HTTP/1.1 with no third-party dependencies.
//
// Usage:
//   glt::Graph g("127.0.0.1", 8000);
//   auto q = g.V("item").batch(4).alias("src")
//             .outV("rel").sample(3).by("topk").alias("h1");
//   int qid = g.install(q, /*micro_batch=*/32);
//   glt::Json out = g.run(qid, {0, 10, 20});
//   // out["h1"]["ids"][0][1].num() ...

#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace glt {

// ---------------------------------------------------------------------------
// Minimal JSON value + parser + serializer (RFC 8259 subset: no \u surrogate
// pairs beyond BMP; numbers as double with int fast path).
// ---------------------------------------------------------------------------
class Json {
 public:
  enum class Type { Null, Bool, Int, Double, String, Array, Object };

  Json() : type_(Type::Null) {}
  Json(std::nullptr_t) : type_(Type::Null) {}
  Json(bool b) : type_(Type::Bool), bool_(b) {}
  Json(int v) : type_(Type::Int), int_(v) {}
  Json(int64_t v) : type_(Type::Int), int_(v) {}
  Json(double v) : type_(Type::Double), dbl_(v) {}
  Json(const char* s) : type_(Type::String), str_(s) {}
  Json(const std::string& s) : type_(Type::String), str_(s) {}

  static Json array() { Json j; j.type_ = Type::Array; return j; }
  static Json object() { Json j; j.type_ = Type::Object; return j; }

  Type type() const { return type_; }
  bool is_null() const { return type_ == Type::Null; }
  bool boolean() const { require(Type::Bool); return bool_; }
  int64_t integer() const {
    if (type_ == Type::Double) return static_cast<int64_t>(dbl_);
    require(Type::Int);
    return int_;
  }
  double num() const {
    if (type_ == Type::Int) return static_cast<double>(int_);
    require(Type::Double);
    return dbl_;
  }
  const std::string& str() const { require(Type::String); return str_; }
  const std::vector<Json>& items() const { require(Type::Array); return arr_; }
  size_t size() const {
    return type_ == Type::Array ? arr_.size() : obj_.size();
  }

  void push_back(Json v) { require(Type::Array); arr_.push_back(std::move(v)); }
  Json& operator[](size_t i) { require(Type::Array); return arr_.at(i); }
  const Json& operator[](size_t i) const { require(Type::Array); return arr_.at(i); }
  Json& operator[](const std::string& k) {
    if (type_ == Type::Null) type_ = Type::Object;
    require(Type::Object);
    return obj_[k];
  }
  const Json& at(const std::string& k) const {
    require(Type::Object);
    auto it = obj_.find(k);
    if (it == obj_.end()) throw std::runtime_error("json: no key " + k);
    return it->second;
  }
  bool contains(const std::string& k) const {
    return type_ == Type::Object && obj_.count(k) > 0;
  }
  const std::map<std::string, Json>& entries() const {
    require(Type::Object);
    return obj_;
  }

  std::string dump() const {
    std::ostringstream os;
    write(os);
    return os.str();
  }

  static Json parse(const std::string& text) {
    size_t pos = 0;
    Json v = parse_value(text, pos);
    skip_ws(text, pos);
    if (pos != text.size()) throw std::runtime_error("json: trailing data");
    return v;
  }

 private:
  void require(Type t) const {
    if (type_ != t) throw std::runtime_error("json: wrong type access");
  }

  void write(std::ostringstream& os) const {
    switch (type_) {
      case Type::Null: os << "null"; break;
      case Type::Bool: os << (bool_ ? "true" : "false"); break;
      case Type::Int: os << int_; break;
      case Type::Double: {
        if (std::isfinite(dbl_)) {
          std::ostringstream t;
          t.precision(17);
          t << dbl_;
          os << t.str();
        } else {
          os << "null";
        }
        break;
      }
      case Type::String: write_str(os, str_); break;
      case Type::Array: {
        os << '[';
        for (size_t i = 0; i < arr_.size(); ++i) {
          if (i) os << ',';
          arr_[i].write(os);
        }
        os << ']';
        break;
      }
      case Type::Object: {
        os << '{';
        bool first = true;
        for (const auto& kv : obj_) {
          if (!first) os << ',';
          first = false;
          write_str(os, kv.first);
          os << ':';
          kv.second.write(os);
        }
        os << '}';
        break;
      }
    }
  }

  static void write_str(std::ostringstream& os, const std::string& s) {
    os << '"';
    for (char c : s) {
      switch (c) {
        case '"': os << "\\\""; break;
        case '\\': os << "\\\\"; break;
        case '\n': os << "\\n"; break;
        case '\r': os << "\\r"; break;
        case '\t': os << "\\t"; break;
        default:
          if (static_cast<unsigned char>(c) < 0x20) {
            char buf[8];
            std::snprintf(buf, sizeof buf, "\\u%04x", c);
            os << buf;
          } else {
            os << c;
          }
      }
    }
    os << '"';
  }

  static void skip_ws(const std::string& t, size_t& p) {
    while (p < t.size() && std::isspace(static_cast<unsigned char>(t[p]))) ++p;
  }

  static Json parse_value(const std::string& t, size_t& p) {
    skip_ws(t, p);
    if (p >= t.size()) throw std::runtime_error("json: eof");
    char c = t[p];
    if (c == '{') return parse_object(t, p);
    if (c == '[') return parse_array(t, p);
    if (c == '"') return Json(parse_string(t, p));
    if (t.compare(p, 4, "null") == 0) { p += 4; return Json(); }
    if (t.compare(p, 4, "true") == 0) { p += 4; return Json(true); }
    if (t.compare(p, 5, "false") == 0) { p += 5; return Json(false); }
    return parse_number(t, p);
  }

  static Json parse_object(const std::string& t, size_t& p) {
    Json o = Json::object();
    ++p;  // {
    skip_ws(t, p);
    if (p < t.size() && t[p] == '}') { ++p; return o; }
    for (;;) {
      skip_ws(t, p);
      std::string key = parse_string(t, p);
      skip_ws(t, p);
      if (p >= t.size() || t[p] != ':') throw std::runtime_error("json: want :");
      ++p;
      o[key] = parse_value(t, p);
      skip_ws(t, p);
      if (p >= t.size()) throw std::runtime_error("json: eof in object");
      if (t[p] == ',') { ++p; continue; }
      if (t[p] == '}') { ++p; return o; }
      throw std::runtime_error("json: bad object");
    }
  }

  static Json parse_array(const std::string& t, size_t& p) {
    Json a = Json::array();
    ++p;  // [
    skip_ws(t, p);
    if (p < t.size() && t[p] == ']') { ++p; return a; }
    for (;;) {
      a.push_back(parse_value(t, p));
      skip_ws(t, p);
      if (p >= t.size()) throw std::runtime_error("json: eof in array");
      if (t[p] == ',') { ++p; continue; }
      if (t[p] == ']') { ++p; return a; }
      throw std::runtime_error("json: bad array");
    }
  }

  static std::string parse_string(const std::string& t, size_t& p) {
    if (t[p] != '"') throw std::runtime_error("json: want string");
    ++p;
    std::string out;
    while (p < t.size() && t[p] != '"') {
      char c = t[p++];
      if (c != '\\') { out += c; continue; }
      if (p >= t.size()) break;
      char e = t[p++];
      switch (e) {
        case 'n': out += '\n'; break;
        case 't': out += '\t'; break;
        case 'r': out += '\r'; break;
        case 'b': out += '\b'; break;
        case 'f': out += '\f'; break;
        case 'u': {
          if (p + 4 > t.size()) throw std::runtime_error("json: bad \\u");
          unsigned cp = std::stoul(t.substr(p, 4), nullptr, 16);
          p += 4;
          // UTF-8 encode (BMP only)
          if (cp < 0x80) out += static_cast<char>(cp);
          else if (cp < 0x800) {
            out += static_cast<char>(0xC0 | (cp >> 6));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          } else {
            out += static_cast<char>(0xE0 | (cp >> 12));
            out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
            out += static_cast<char>(0x80 | (cp & 0x3F));
          }
          break;
        }
        default: out += e;
      }
    }
    if (p >= t.size()) throw std::runtime_error("json: unterminated string");
    ++p;  // closing quote
    return out;
  }

  static Json parse_number(const std::string& t, size_t& p) {
    size_t start = p;
    if (p < t.size() && (t[p] == '-' || t[p] == '+')) ++p;
    bool is_int = true;
    while (p < t.size() &&
           (std::isdigit(static_cast<unsigned char>(t[p])) || t[p] == '.' ||
            t[p] == 'e' || t[p] == 'E' || t[p] == '-' || t[p] == '+')) {
      if (t[p] == '.' || t[p] == 'e' || t[p] == 'E') is_int = false;
      ++p;
    }
    std::string s = t.substr(start, p - start);
    if (s.empty()) throw std::runtime_error("json: bad number");
    if (is_int) return Json(static_cast<int64_t>(std::stoll(s)));
    return Json(std::stod(s));
  }

  Type type_;
  bool bool_ = false;
  int64_t int_ = 0;
  double dbl_ = 0.0;
  std::string str_;
  std::vector<Json> arr_;
  std::map<std::string, Json> obj_;
};

// ---------------------------------------------------------------------------
// HTTP/1.1 client over POSIX sockets (Content-Length bodies only — matches
// online/http.py's responses).
// ---------------------------------------------------------------------------
class HttpClient {
 public:
  HttpClient(std::string host, int port) : host_(std::move(host)), port_(port) {}

  Json post(const std::string& path, const Json& body) {
    return request("POST", path, body.dump());
  }
  Json get(const std::string& path) { return request("GET", path, ""); }

 private:
  Json request(const std::string& method, const std::string& path,
               const std::string& body) {
    int fd = connect_socket();
    std::ostringstream req;
    req << method << " " << path << " HTTP/1.1\r\n"
        << "Host: " << host_ << ":" << port_ << "\r\n"
        << "Content-Type: application/json\r\n"
        << "Content-Length: " << body.size() << "\r\n"
        << "Connection: close\r\n\r\n"
        << body;
    std::string data = req.str();
    size_t sent = 0;
    while (sent < data.size()) {
      ssize_t n = ::send(fd, data.data() + sent, data.size() - sent, 0);
      if (n <= 0) { ::close(fd); throw std::runtime_error("http: send failed"); }
      sent += static_cast<size_t>(n);
    }
    std::string resp;
    char buf[65536];
    for (;;) {
      ssize_t n = ::recv(fd, buf, sizeof buf, 0);
      if (n < 0) { ::close(fd); throw std::runtime_error("http: recv failed"); }
      if (n == 0) break;
      resp.append(buf, static_cast<size_t>(n));
    }
    ::close(fd);
    size_t hdr_end = resp.find("\r\n\r\n");
    if (hdr_end == std::string::npos)
      throw std::runtime_error("http: malformed response");
    std::string payload = resp.substr(hdr_end + 4);
    int code = std::stoi(resp.substr(9, 3));
    Json parsed = Json::parse(payload);
    if (code != 200) {
      std::string err = parsed.contains("error") ? parsed.at("error").str()
                                                 : payload;
      throw std::runtime_error("http " + std::to_string(code) + ": " + err);
    }
    return parsed;
  }

  int connect_socket() {
    struct addrinfo hints;
    std::memset(&hints, 0, sizeof hints);
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo* res = nullptr;
    std::string port_s = std::to_string(port_);
    if (getaddrinfo(host_.c_str(), port_s.c_str(), &hints, &res) != 0)
      throw std::runtime_error("http: getaddrinfo failed for " + host_);
    int fd = -1;
    for (auto* p = res; p; p = p->ai_next) {
      fd = ::socket(p->ai_family, p->ai_socktype, p->ai_protocol);
      if (fd < 0) continue;
      if (::connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
      ::close(fd);
      fd = -1;
    }
    freeaddrinfo(res);
    if (fd < 0) throw std::runtime_error("http: connect failed");
    return fd;
  }

  std::string host_;
  int port_;
};

// ---------------------------------------------------------------------------
// Fluent GSL traversal builder -> plan JSON (gsl/plan.py wire format).
// Mirrors the Java client's Traversal surface (Traversal.java:28-167:
// feed/outV/outE/inV/sample/by/alias) against this framework's plan schema.
// ---------------------------------------------------------------------------
class Traversal {
 public:
  Traversal& batch(int n) { batch_size_ = n; return *this; }
  Traversal& alias(const std::string& a) { cur().alias = a; return *this; }
  Traversal& sample(int k) { cur().count = k; return *this; }
  Traversal& by(const std::string& strategy) { cur().strategy = strategy; return *this; }
  Traversal& outV(const std::string& edge) { return hop("out_v", edge); }
  Traversal& inV(const std::string& edge) { return hop("in_v", edge); }
  Traversal& outE(const std::string& edge) { return hop("out_e", edge); }
  Traversal& inE(const std::string& edge) { return hop("in_e", edge); }
  Traversal& outNeg(const std::string& edge) { return hop("out_neg", edge); }
  Traversal& inNeg(const std::string& edge) { return hop("in_neg", edge); }

  Json plan() const {
    Json p = Json::object();
    p["batch_size"] = Json(batch_size_);
    Json nodes = Json::array();
    for (size_t i = 0; i < nodes_.size(); ++i) {
      const Node& n = nodes_[i];
      Json rec = Json::object();
      rec["nid"] = Json(static_cast<int64_t>(i));
      rec["parent"] = i == 0 ? Json() : Json(static_cast<int64_t>(i - 1));
      rec["endpoint"] = Json(false);
      rec["kind"] = Json(n.kind);
      rec["edge_type"] = n.edge_type.empty() ? Json() : Json(n.edge_type);
      rec["node_type"] = n.node_type.empty() ? Json() : Json(n.node_type);
      rec["alias_name"] = n.alias.empty() ? Json() : Json(n.alias);
      rec["count"] = Json(n.count);
      rec["strategy"] = Json(n.strategy);
      rec["base_strategy"] = Json("random");
      rec["filter_alias"] = Json();
      rec["condition"] = Json();
      rec["walk_len"] = Json(0);
      rec["walk_p"] = Json(1.0);
      rec["walk_q"] = Json(1.0);
      rec["nbr_cap"] = Json();
      rec["need_dist"] = Json(false);
      nodes.push_back(rec);
    }
    p["nodes"] = nodes;
    return p;
  }

 private:
  friend class Graph;
  struct Node {
    std::string kind, edge_type, node_type, alias, strategy;
    int count = 0;
  };

  explicit Traversal(const std::string& node_type) {
    Node src;
    src.kind = "source_v";
    src.node_type = node_type;
    src.strategy = "by_order";
    nodes_.push_back(src);
  }

  Node& cur() { return nodes_.back(); }

  Traversal& hop(const std::string& kind, const std::string& edge) {
    Node n;
    n.kind = kind;
    n.edge_type = edge;
    n.strategy = "random";
    nodes_.push_back(n);
    return *this;
  }

  int batch_size_ = 64;
  std::vector<Node> nodes_;
};

// ---------------------------------------------------------------------------
// Graph — the client entry point (install/run/schema/stats/update/refresh).
// ---------------------------------------------------------------------------
class Graph {
 public:
  Graph(const std::string& host, int port) : http_(host, port) {}

  Traversal V(const std::string& node_type) { return Traversal(node_type); }

  Json schema() { return http_.get("/admin/schema"); }

  int install(const Traversal& q, int micro_batch = 256) {
    Json plan = q.plan();
    plan["micro_batch"] = Json(micro_batch);
    return static_cast<int>(http_.post("/admin/query", plan).at("qid").integer());
  }

  Json run(int qid, const std::vector<int64_t>& ids) {
    Json body = Json::object();
    body["qid"] = Json(qid);
    Json a = Json::array();
    for (int64_t v : ids) a.push_back(Json(v));
    body["ids"] = a;
    return http_.post("/serving", body);
  }

  Json stats(int qid) {
    return http_.get("/admin/query/stats?qid=" + std::to_string(qid));
  }

  Json update(const Json& nodes, const Json& edges) {
    Json body = Json::object();
    body["nodes"] = nodes;
    body["edges"] = edges;
    return http_.post("/admin/update", body);
  }

  Json refresh() { return http_.post("/admin/refresh", Json::object()); }

 private:
  HttpClient http_;
};

}  // namespace glt
