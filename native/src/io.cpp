/* Point-cloud file IO: PCD (ascii/binary), PLY (ascii/binary_le), KITTI .bin.
 *
 * Replaces the PCL reader stack the reference links for its IO
 * (pcl::io::loadPCDFile at app.cpp:269, loadPLYFile at app_ros.cpp:289,
 * savePointCloudPCLwithPose at cloudIO.cpp:53-67). Only xyz is materialized —
 * the pipeline consumes xyz float32 — but arbitrary field layouts are
 * stepped over correctly.
 */
#include "aicp_native.h"

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Field {
  std::string name;
  char type;    // F, I, U
  int size;     // bytes
  int count;
};

bool read_line(FILE* f, std::string& out) {
  out.clear();
  int c;
  while ((c = std::fgetc(f)) != EOF) {
    if (c == '\n') return true;
    if (c != '\r') out.push_back(static_cast<char>(c));
  }
  return !out.empty();
}

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && std::isspace(static_cast<unsigned char>(s[i]))) i++;
    size_t j = i;
    while (j < s.size() && !std::isspace(static_cast<unsigned char>(s[j]))) j++;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

double field_to_double(const unsigned char* p, char type, int size) {
  switch (type) {
    case 'F':
      if (size == 4) { float v; std::memcpy(&v, p, 4); return v; }
      if (size == 8) { double v; std::memcpy(&v, p, 8); return v; }
      break;
    case 'I':
      if (size == 1) { signed char v; std::memcpy(&v, p, 1); return v; }
      if (size == 2) { short v; std::memcpy(&v, p, 2); return v; }
      if (size == 4) { int v; std::memcpy(&v, p, 4); return v; }
      break;
    case 'U':
      if (size == 1) { unsigned char v; std::memcpy(&v, p, 1); return v; }
      if (size == 2) { unsigned short v; std::memcpy(&v, p, 2); return v; }
      if (size == 4) { unsigned int v; std::memcpy(&v, p, 4); return v; }
      break;
  }
  return 0.0;
}

long finite_filter(std::vector<float>& xyz) {
  long n = static_cast<long>(xyz.size() / 3), w = 0;
  for (long i = 0; i < n; i++) {
    float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (std::isfinite(x) && std::isfinite(y) && std::isfinite(z)) {
      xyz[3 * w] = x; xyz[3 * w + 1] = y; xyz[3 * w + 2] = z;
      w++;
    }
  }
  xyz.resize(3 * w);
  return w;
}

float* steal(std::vector<float>& v) {
  float* out = static_cast<float*>(std::malloc(v.size() * sizeof(float)));
  if (out) std::memcpy(out, v.data(), v.size() * sizeof(float));
  return out;
}

}  // namespace

extern "C" {

long aicp_pcd_read(const char* path, float** out_xyz, double viewpoint[7]) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<Field> fields;
  long n_points = -1;
  std::string data_mode;
  double vp[7] = {0, 0, 0, 1, 0, 0, 0};

  std::string line;
  std::vector<std::string> types, sizes, counts;
  while (read_line(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    auto tok = split_ws(line);
    if (tok.empty()) continue;
    std::string key = tok[0];
    for (auto& c : key) c = static_cast<char>(std::toupper(c));
    if (key == "FIELDS") {
      fields.clear();
      for (size_t i = 1; i < tok.size(); i++)
        fields.push_back({tok[i], 'F', 4, 1});
    } else if (key == "SIZE") {
      for (size_t i = 1; i < tok.size() && i - 1 < fields.size(); i++)
        fields[i - 1].size = std::atoi(tok[i].c_str());
    } else if (key == "TYPE") {
      for (size_t i = 1; i < tok.size() && i - 1 < fields.size(); i++)
        fields[i - 1].type = tok[i][0];
    } else if (key == "COUNT") {
      for (size_t i = 1; i < tok.size() && i - 1 < fields.size(); i++)
        fields[i - 1].count = std::atoi(tok[i].c_str());
    } else if (key == "POINTS") {
      n_points = std::atol(tok[1].c_str());
    } else if (key == "VIEWPOINT") {
      for (size_t i = 1; i < tok.size() && i <= 7; i++)
        vp[i - 1] = std::atof(tok[i].c_str());
    } else if (key == "DATA") {
      data_mode = tok.size() > 1 ? tok[1] : "";
      break;
    }
  }
  if (n_points < 0 || fields.empty() || data_mode.empty()) {
    std::fclose(f);
    return -2;
  }
  int xi = -1, yi = -1, zi = -1, stride = 0;
  std::vector<int> offsets(fields.size());
  for (size_t i = 0; i < fields.size(); i++) {
    offsets[i] = stride;
    stride += fields[i].size * fields[i].count;
    if (fields[i].name == "x") xi = static_cast<int>(i);
    if (fields[i].name == "y") yi = static_cast<int>(i);
    if (fields[i].name == "z") zi = static_cast<int>(i);
  }
  if (xi < 0 || yi < 0 || zi < 0) {
    std::fclose(f);
    return -2;
  }

  std::vector<float> xyz;
  xyz.reserve(static_cast<size_t>(n_points) * 3);
  if (data_mode == "ascii") {
    // column index of each field start in whitespace-separated tokens
    std::vector<int> col(fields.size());
    int c = 0;
    for (size_t i = 0; i < fields.size(); i++) {
      col[i] = c;
      c += fields[i].count;
    }
    for (long i = 0; i < n_points && read_line(f, line); ) {
      auto tok = split_ws(line);
      if (tok.empty()) continue;
      if (static_cast<int>(tok.size()) < c) continue;
      xyz.push_back(std::strtof(tok[col[xi]].c_str(), nullptr));
      xyz.push_back(std::strtof(tok[col[yi]].c_str(), nullptr));
      xyz.push_back(std::strtof(tok[col[zi]].c_str(), nullptr));
      i++;
    }
  } else if (data_mode == "binary") {
    std::vector<unsigned char> buf(static_cast<size_t>(stride) * n_points);
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    long n_ok = static_cast<long>(got / stride);
    for (long i = 0; i < n_ok; i++) {
      const unsigned char* row = buf.data() + static_cast<size_t>(i) * stride;
      xyz.push_back(static_cast<float>(
          field_to_double(row + offsets[xi], fields[xi].type, fields[xi].size)));
      xyz.push_back(static_cast<float>(
          field_to_double(row + offsets[yi], fields[yi].type, fields[yi].size)));
      xyz.push_back(static_cast<float>(
          field_to_double(row + offsets[zi], fields[zi].type, fields[zi].size)));
    }
  } else if (data_mode == "binary_compressed") {
    // PCL layout: u32 compressed_size, u32 uncompressed_size, LZF payload.
    // Decompressed data is stored field-by-field (SoA): all of field 0 for
    // every point, then field 1, ... (pcl::io::PCDWriter::writeBinaryCompressed).
    unsigned int csize = 0, usize = 0;
    if (std::fread(&csize, 4, 1, f) != 1 || std::fread(&usize, 4, 1, f) != 1) {
      std::fclose(f);
      return -2;
    }
    // Validate the header-declared sizes before allocating: a corrupt or
    // truncated file could otherwise request up to 4 GiB per buffer and
    // throw std::bad_alloc across the extern "C"/ctypes boundary.
    long pos = std::ftell(f);
    if (pos < 0 || std::fseek(f, 0, SEEK_END) != 0) {
      std::fclose(f);
      return -2;
    }
    long fsize = std::ftell(f);
    std::fseek(f, pos, SEEK_SET);
    const unsigned long long kMaxUncompressed = 1ull << 30;  // 1 GiB cap
    if (fsize < 0 || static_cast<unsigned long long>(csize) >
                         static_cast<unsigned long long>(fsize - pos) ||
        static_cast<unsigned long long>(usize) > kMaxUncompressed) {
      std::fclose(f);
      return -2;
    }
    std::vector<unsigned char> cbuf(csize), ubuf(usize);
    if (std::fread(cbuf.data(), 1, csize, f) != csize) {
      std::fclose(f);
      return -2;
    }
    if (aicp_lzf_decompress(cbuf.data(), static_cast<long>(csize),
                            ubuf.data(), static_cast<long>(usize)) !=
        static_cast<long>(usize)) {
      std::fclose(f);
      return -2;
    }
    std::vector<long> fstart(fields.size());
    long acc = 0;
    for (size_t i = 0; i < fields.size(); i++) {
      fstart[i] = acc;
      acc += static_cast<long>(fields[i].size) * fields[i].count * n_points;
    }
    if (acc > static_cast<long>(usize)) {
      std::fclose(f);
      return -2;
    }
    for (long i = 0; i < n_points; i++) {
      xyz.push_back(static_cast<float>(field_to_double(
          ubuf.data() + fstart[xi] +
              i * static_cast<long>(fields[xi].size) * fields[xi].count,
          fields[xi].type, fields[xi].size)));
      xyz.push_back(static_cast<float>(field_to_double(
          ubuf.data() + fstart[yi] +
              i * static_cast<long>(fields[yi].size) * fields[yi].count,
          fields[yi].type, fields[yi].size)));
      xyz.push_back(static_cast<float>(field_to_double(
          ubuf.data() + fstart[zi] +
              i * static_cast<long>(fields[zi].size) * fields[zi].count,
          fields[zi].type, fields[zi].size)));
    }
  } else {
    std::fclose(f);
    return -3;  // unknown DATA mode
  }
  std::fclose(f);

  long n = finite_filter(xyz);
  *out_xyz = steal(xyz);
  if (!*out_xyz && n > 0) return -2;
  if (viewpoint) std::memcpy(viewpoint, vp, sizeof(vp));
  return n;
}

long aicp_ply_read(const char* path, float** out_xyz) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string line;
  if (!read_line(f, line) || split_ws(line) != std::vector<std::string>{"ply"}) {
    std::fclose(f);
    return -2;
  }
  std::string format;
  long n_vertex = -1;
  // per-vertex property sizes; x/y/z property indices
  std::vector<std::pair<int, char>> props;  // (size, type F/I/U)
  int xi = -1, yi = -1, zi = -1;
  bool in_vertex = false;
  bool saw_other_element_props = false;
  while (read_line(f, line)) {
    auto tok = split_ws(line);
    if (tok.empty()) continue;
    if (tok[0] == "format") {
      format = tok[1];
    } else if (tok[0] == "element") {
      in_vertex = (tok[1] == "vertex");
      if (in_vertex) n_vertex = std::atol(tok[2].c_str());
    } else if (tok[0] == "property" && in_vertex) {
      if (tok[1] == "list") { std::fclose(f); return -3; }
      int size = 4;
      char type = 'F';
      const std::string& t = tok[1];
      if (t == "float" || t == "float32") { size = 4; type = 'F'; }
      else if (t == "double" || t == "float64") { size = 8; type = 'F'; }
      else if (t == "char" || t == "int8") { size = 1; type = 'I'; }
      else if (t == "uchar" || t == "uint8") { size = 1; type = 'U'; }
      else if (t == "short" || t == "int16") { size = 2; type = 'I'; }
      else if (t == "ushort" || t == "uint16") { size = 2; type = 'U'; }
      else if (t == "int" || t == "int32") { size = 4; type = 'I'; }
      else if (t == "uint" || t == "uint32") { size = 4; type = 'U'; }
      if (tok[2] == "x") xi = static_cast<int>(props.size());
      if (tok[2] == "y") yi = static_cast<int>(props.size());
      if (tok[2] == "z") zi = static_cast<int>(props.size());
      props.push_back({size, type});
    } else if (tok[0] == "property" && !in_vertex) {
      saw_other_element_props = true;
    } else if (tok[0] == "end_header") {
      break;
    }
  }
  if (n_vertex < 0 || xi < 0 || yi < 0 || zi < 0) {
    std::fclose(f);
    return -2;
  }
  (void)saw_other_element_props;  // trailing elements are simply not read

  std::vector<float> xyz;
  xyz.reserve(static_cast<size_t>(n_vertex) * 3);
  if (format == "ascii") {
    for (long i = 0; i < n_vertex && read_line(f, line); i++) {
      auto tok = split_ws(line);
      if (static_cast<int>(tok.size()) < static_cast<int>(props.size())) {
        std::fclose(f);
        return -2;
      }
      xyz.push_back(std::strtof(tok[xi].c_str(), nullptr));
      xyz.push_back(std::strtof(tok[yi].c_str(), nullptr));
      xyz.push_back(std::strtof(tok[zi].c_str(), nullptr));
    }
  } else if (format == "binary_little_endian") {
    int stride = 0;
    std::vector<int> offsets(props.size());
    for (size_t i = 0; i < props.size(); i++) {
      offsets[i] = stride;
      stride += props[i].first;
    }
    std::vector<unsigned char> buf(static_cast<size_t>(stride) * n_vertex);
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    long n_ok = static_cast<long>(got / stride);
    for (long i = 0; i < n_ok; i++) {
      const unsigned char* row = buf.data() + static_cast<size_t>(i) * stride;
      xyz.push_back(static_cast<float>(
          field_to_double(row + offsets[xi], props[xi].second, props[xi].first)));
      xyz.push_back(static_cast<float>(
          field_to_double(row + offsets[yi], props[yi].second, props[yi].first)));
      xyz.push_back(static_cast<float>(
          field_to_double(row + offsets[zi], props[zi].second, props[zi].first)));
    }
  } else {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);
  long n = finite_filter(xyz);
  *out_xyz = steal(xyz);
  if (!*out_xyz && n > 0) return -2;
  return n;
}

long aicp_kitti_bin_read(const char* path, float** out_xyz) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  long n = bytes / (4 * sizeof(float));  // x y z intensity
  std::vector<float> raw(static_cast<size_t>(n) * 4);
  size_t got = std::fread(raw.data(), sizeof(float), raw.size(), f);
  std::fclose(f);
  n = static_cast<long>(got / 4);
  std::vector<float> xyz;
  xyz.reserve(static_cast<size_t>(n) * 3);
  for (long i = 0; i < n; i++) {
    xyz.push_back(raw[4 * i]);
    xyz.push_back(raw[4 * i + 1]);
    xyz.push_back(raw[4 * i + 2]);
  }
  long n_out = finite_filter(xyz);
  *out_xyz = steal(xyz);
  if (!*out_xyz && n_out > 0) return -2;
  return n_out;
}

long aicp_cloud_read(const char* path, float** out_xyz, double viewpoint[7]) {
  if (viewpoint) {
    const double ident[7] = {0, 0, 0, 1, 0, 0, 0};
    std::memcpy(viewpoint, ident, sizeof(ident));
  }
  std::string p(path);
  auto dot = p.rfind('.');
  std::string ext = dot == std::string::npos ? "" : p.substr(dot);
  for (auto& c : ext) c = static_cast<char>(std::tolower(c));
  if (ext == ".pcd") return aicp_pcd_read(path, out_xyz, viewpoint);
  if (ext == ".ply") return aicp_ply_read(path, out_xyz);
  if (ext == ".bin") return aicp_kitti_bin_read(path, out_xyz);
  return -3;
}

int aicp_pcd_write(const char* path, const float* xyz, long n,
                   const double viewpoint[7], int binary) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const double ident[7] = {0, 0, 0, 1, 0, 0, 0};
  const double* vp = viewpoint ? viewpoint : ident;
  const char* mode = binary == 2 ? "binary_compressed"
                                 : (binary ? "binary" : "ascii");
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\n"
               "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
               "COUNT 1 1 1\nWIDTH %ld\nHEIGHT 1\n"
               "VIEWPOINT %g %g %g %g %g %g %g\nPOINTS %ld\nDATA %s\n",
               n, vp[0], vp[1], vp[2], vp[3], vp[4], vp[5], vp[6], n, mode);
  if (binary == 2) {
    // SoA reorder (all x, all y, all z), LZF, then u32 sizes + payload.
    size_t usize = static_cast<size_t>(n) * 3 * sizeof(float);
    std::vector<unsigned char> soa(usize);
    float* fx = reinterpret_cast<float*>(soa.data());
    for (long i = 0; i < n; i++) {
      fx[i] = xyz[3 * i];
      fx[n + i] = xyz[3 * i + 1];
      fx[2 * n + i] = xyz[3 * i + 2];
    }
    std::vector<unsigned char> comp(usize + usize / 16 + 64);
    long clen = aicp_lzf_compress(soa.data(), static_cast<long>(usize),
                                  comp.data(), static_cast<long>(comp.size()));
    if (clen < 0) {
      std::fclose(f);
      return -2;
    }
    unsigned int header[2] = {static_cast<unsigned int>(clen),
                              static_cast<unsigned int>(usize)};
    std::fwrite(header, 4, 2, f);
    std::fwrite(comp.data(), 1, static_cast<size_t>(clen), f);
  } else if (binary) {
    std::fwrite(xyz, sizeof(float), static_cast<size_t>(n) * 3, f);
  } else {
    for (long i = 0; i < n; i++)
      std::fprintf(f, "%.6f %.6f %.6f\n", xyz[3 * i], xyz[3 * i + 1],
                   xyz[3 * i + 2]);
  }
  std::fclose(f);
  return 0;
}

void aicp_buffer_free(float* p) { std::free(p); }

}  // extern "C"
