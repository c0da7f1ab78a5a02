// Fast parser for LAMMPS YAML dump files (the data-ETL hot path).
//
// LAMMPS writes one YAML document per MD step:
//
//   ---
//   creator: LAMMPS
//   timestep: 0
//   natoms: 8
//   boundary: [ p p p ]
//   box:
//   - [ 0, 5.43 ]
//   - [ 0, 5.43 ]
//   - [ 0, 5.43 ]
//   keywords: [ id, element, x, y, z, fx, fy, fz ]
//   data:
//   - [ 1, Si, 0.1, 0.2, 0.3, 0.01, 0.02, 0.03 ]
//   ...
//
// This machine-generated subset does not need a general YAML parser; the
// reference burns most of its ETL time in yaml.CLoader
// (src/diffusion_for_multi_scale_molecular_dynamics/data/parse_lammps_outputs.py:54-82).
// Here a single linear pass over the file fills flat arrays directly.
//
// C ABI (consumed through ctypes from
// diffusion_for_multi_scale_molecular_dynamics_tpu/data/lammps_parser.py):
//   parse_lammps_dump_file(path) -> DumpData*  (NULL on failure)
//   dump_data_error()            -> last error message (thread-unsafe, fine
//                                   for the single-threaded loader)
//   free_dump_data(DumpData*)
//
// Atoms are sorted by their LAMMPS id within each step so array order is
// deterministic regardless of dump order.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

std::string g_error;

struct Row {
  int64_t id;
  int32_t element;
  double values[6];  // x y z fx fy fz
};

const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == ',')) ++p;
  return p;
}

bool starts_with(const char* p, const char* end, const char* prefix) {
  size_t n = std::strlen(prefix);
  return static_cast<size_t>(end - p) >= n && std::memcmp(p, prefix, n) == 0;
}

}  // namespace

extern "C" {

struct DumpData {
  int64_t n_steps;
  int64_t natoms;
  int64_t n_elements;
  double* boxes;        // [n_steps, 3] box lengths (hi - lo per dimension)
  double* positions;    // [n_steps, natoms, 3]
  double* forces;       // [n_steps, natoms, 3]
  int32_t* element_ids; // [n_steps, natoms] indices into element_table
  int64_t* atom_ids;    // [n_steps, natoms] original LAMMPS ids
  char* element_table;  // n_elements zero-terminated strings, concatenated
  int64_t element_table_size;
};

const char* dump_data_error() { return g_error.c_str(); }

void free_dump_data(DumpData* d) {
  if (!d) return;
  std::free(d->boxes);
  std::free(d->positions);
  std::free(d->forces);
  std::free(d->element_ids);
  std::free(d->atom_ids);
  std::free(d->element_table);
  std::free(d);
}

DumpData* parse_lammps_dump_file(const char* path) {
  g_error.clear();
  FILE* fh = std::fopen(path, "rb");
  if (!fh) {
    g_error = std::string("cannot open ") + path;
    return nullptr;
  }
  std::fseek(fh, 0, SEEK_END);
  long size = std::ftell(fh);
  std::fseek(fh, 0, SEEK_SET);
  std::string content(static_cast<size_t>(size), '\0');
  if (std::fread(content.data(), 1, static_cast<size_t>(size), fh) !=
      static_cast<size_t>(size)) {
    std::fclose(fh);
    g_error = "short read";
    return nullptr;
  }
  std::fclose(fh);

  std::vector<std::string> element_names;
  std::vector<double> boxes;
  std::vector<std::vector<Row>> steps;

  enum Section { NONE, BOX, DATA };
  Section section = NONE;
  std::vector<Row>* current_rows = nullptr;
  int box_rows_seen = 0;

  const char* p = content.data();
  const char* file_end = p + content.size();

  auto element_index = [&](const char* s, size_t n) -> int32_t {
    for (size_t i = 0; i < element_names.size(); ++i) {
      if (element_names[i].size() == n &&
          std::memcmp(element_names[i].data(), s, n) == 0)
        return static_cast<int32_t>(i);
    }
    element_names.emplace_back(s, n);
    return static_cast<int32_t>(element_names.size() - 1);
  };

  while (p < file_end) {
    const char* line_end = static_cast<const char*>(
        std::memchr(p, '\n', static_cast<size_t>(file_end - p)));
    if (!line_end) line_end = file_end;

    if (starts_with(p, line_end, "---")) {
      steps.emplace_back();
      current_rows = &steps.back();
      section = NONE;
      box_rows_seen = 0;
    } else if (starts_with(p, line_end, "box:")) {
      section = BOX;
    } else if (starts_with(p, line_end, "data:")) {
      section = DATA;
    } else if (p < line_end && *p == '-' && section != NONE) {
      // "- [ v1, v2, ... ]" row.
      const char* q = static_cast<const char*>(
          std::memchr(p, '[', static_cast<size_t>(line_end - p)));
      if (q) {
        ++q;
        if (section == BOX) {
          if (box_rows_seen < 3) {
            char* next = nullptr;
            double lo = std::strtod(q, &next);
            q = skip_ws(next, line_end);
            double hi = std::strtod(q, &next);
            boxes.push_back(hi - lo);
            ++box_rows_seen;
          }
        } else {  // DATA: id element x y z fx fy fz
          Row row;
          char* next = nullptr;
          row.id = std::strtoll(q, &next, 10);
          q = skip_ws(next, line_end);
          const char* name_start = q;
          while (q < line_end && *q != ',' && *q != ' ' && *q != ']') ++q;
          row.element = element_index(name_start,
                                      static_cast<size_t>(q - name_start));
          for (int k = 0; k < 6; ++k) {
            q = skip_ws(q, line_end);
            row.values[k] = std::strtod(q, &next);
            q = next;
          }
          if (!current_rows) {
            g_error = "data row before document start";
            return nullptr;
          }
          current_rows->push_back(row);
        }
      }
    } else if (p < line_end && (*p != ' ')) {
      section = NONE;  // any other top-level key ends the box/data block
    }
    p = line_end + 1;
  }

  if (steps.empty() || steps.front().empty()) {
    g_error = "no steps parsed";
    return nullptr;
  }
  const int64_t n_steps = static_cast<int64_t>(steps.size());
  const int64_t natoms = static_cast<int64_t>(steps.front().size());
  if (boxes.size() != static_cast<size_t>(3 * n_steps)) {
    g_error = "box rows inconsistent with step count";
    return nullptr;
  }
  for (auto& rows : steps) {
    if (static_cast<int64_t>(rows.size()) != natoms) {
      g_error = "variable atom count across steps is not supported";
      return nullptr;
    }
    std::sort(rows.begin(), rows.end(),
              [](const Row& a, const Row& b) { return a.id < b.id; });
  }

  DumpData* out = static_cast<DumpData*>(std::calloc(1, sizeof(DumpData)));
  out->n_steps = n_steps;
  out->natoms = natoms;
  out->n_elements = static_cast<int64_t>(element_names.size());
  out->boxes =
      static_cast<double*>(std::malloc(sizeof(double) * 3 * n_steps));
  out->positions = static_cast<double*>(
      std::malloc(sizeof(double) * 3 * n_steps * natoms));
  out->forces = static_cast<double*>(
      std::malloc(sizeof(double) * 3 * n_steps * natoms));
  out->element_ids = static_cast<int32_t*>(
      std::malloc(sizeof(int32_t) * n_steps * natoms));
  out->atom_ids = static_cast<int64_t*>(
      std::malloc(sizeof(int64_t) * n_steps * natoms));

  std::memcpy(out->boxes, boxes.data(), sizeof(double) * 3 * n_steps);
  for (int64_t s = 0; s < n_steps; ++s) {
    for (int64_t a = 0; a < natoms; ++a) {
      const Row& row = steps[static_cast<size_t>(s)][static_cast<size_t>(a)];
      const int64_t base = 3 * (s * natoms + a);
      for (int k = 0; k < 3; ++k) {
        out->positions[base + k] = row.values[k];
        out->forces[base + k] = row.values[3 + k];
      }
      out->element_ids[s * natoms + a] = row.element;
      out->atom_ids[s * natoms + a] = row.id;
    }
  }

  size_t table_size = 0;
  for (const auto& name : element_names) table_size += name.size() + 1;
  out->element_table = static_cast<char*>(std::malloc(table_size));
  out->element_table_size = static_cast<int64_t>(table_size);
  char* t = out->element_table;
  for (const auto& name : element_names) {
    std::memcpy(t, name.c_str(), name.size() + 1);
    t += name.size() + 1;
  }
  return out;
}

}  // extern "C"
