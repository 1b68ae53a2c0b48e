// TPC-H .tbl -> binary columnar converter (CSVConvert.cpp capability,
// re-designed: single-pass streaming parser, no vendored csv lib).
//
// Usage: csv_convert <tbl_dir> <out_base_dir> <scale_tag>
//   reads <tbl_dir>/{lineitem,orders,customer,part,nation}.tbl (pipe-separated)
//   writes <out_base_dir>/<table>.tbl.dir/{size,<col>.bin} in the layout of
//   aqp_tpu/data/tpch_loader.py (= the reference's layout: tuple_t key
//   columns as interleaved (u32 key, u32 rowID), dates as u64 epoch seconds,
//   enums as u8 codes, quantity as f32).
//
// Enum codings match aqp_tpu/queries/tables.py / TpcHTypes.hpp:7-31.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <string>
#include <string_view>
#include <vector>

namespace fs = std::filesystem;

static uint64_t parse_date_epoch(std::string_view v) {
  // YYYY-MM-DD -> epoch seconds (UTC), matching the reference's conversion
  std::tm tm{};
  tm.tm_year = std::stoi(std::string(v.substr(0, 4))) - 1900;
  tm.tm_mon = std::stoi(std::string(v.substr(5, 2))) - 1;
  tm.tm_mday = std::stoi(std::string(v.substr(8, 2)));
  return static_cast<uint64_t>(timegm(&tm));
}

static uint8_t shipmode_code(std::string_view v) {
  if (v == "MAIL") return 1;
  if (v == "SHIP") return 2;
  if (v == "AIR") return 3;
  if (v == "REG AIR") return 4;  // L_SHIPMODE_AIR_REG
  if (v == "TRUCK") return 5;
  if (v == "RAIL") return 6;
  if (v == "FOB") return 7;
  return 0;
}

static uint8_t shipinstruct_code(std::string_view v) {
  if (v == "DELIVER IN PERSON") return 1;
  if (v == "COLLECT COD") return 2;
  if (v == "NONE") return 3;
  if (v == "TAKE BACK RETURN") return 4;
  return 0;
}

static uint8_t mktsegment_code(std::string_view v) {
  if (v == "BUILDING") return 1;
  if (v == "AUTOMOBILE") return 2;
  if (v == "FURNITURE") return 3;
  if (v == "HOUSEHOLD") return 4;
  if (v == "MACHINERY") return 5;
  return 0;
}

static uint8_t brand_code(std::string_view v) {
  // "Brand#12" -> 1, "Brand#23" -> 2, "Brand#34" -> 3, others dense 4+
  if (v == "Brand#12") return 1;
  if (v == "Brand#23") return 2;
  if (v == "Brand#34") return 3;
  // stable fallback: hash the two digits into 4..254
  if (v.size() >= 8) {
    int d = (v[6] - '0') * 10 + (v[7] - '0');
    uint8_t c = static_cast<uint8_t>(4 + (d % 250));
    if (c <= 3) c = 4;
    return c;
  }
  return 0;
}

static uint8_t container_code(std::string_view v) {
  static const char *names[] = {
      "SM CASE", "SM BOX", "SM PACK", "SM PKG",      // 1..4
      "MED BAG", "MED BOX", "MED PKG", "MED PACK",   // 5..8
      "LG CASE", "LG BOX", "LG PACK", "LG PKG",      // 9..12
      "JUMBO BAG", "JUMBO BOX", "JUMBO CASE", "JUMBO JAR"};  // 13..16
  for (unsigned i = 0; i < 16; i++)
    if (v == names[i]) return static_cast<uint8_t>(i + 1);
  return 0;
}

struct ColumnWriters {
  std::vector<std::ofstream> files;
  std::ofstream &open(const fs::path &p) {
    files.emplace_back(p, std::ios::binary);
    return files.back();
  }
};

template <class T>
static void put(std::ofstream &f, T v) {
  f.write(reinterpret_cast<const char *>(&v), sizeof(T));
}

static std::vector<std::string_view> split_fields(const std::string &line) {
  std::vector<std::string_view> out;
  size_t start = 0;
  std::string_view sv{line};
  for (size_t i = 0; i <= sv.size(); i++) {
    if (i == sv.size() || sv[i] == '|') {
      out.push_back(sv.substr(start, i - start));
      start = i + 1;
    }
  }
  return out;
}

static void write_size(const fs::path &dir, uint64_t n) {
  std::ofstream f(dir / "size");
  f << n;
}

static uint64_t convert_lineitem(const fs::path &in, const fs::path &outdir) {
  fs::create_directories(outdir);
  std::ifstream f(in);
  if (!f) return 0;
  std::ofstream okey(outdir / "l_orderkey.bin", std::ios::binary);
  std::ofstream ship(outdir / "l_shipdate.bin", std::ios::binary);
  std::ofstream commit(outdir / "l_commitdate.bin", std::ios::binary);
  std::ofstream receipt(outdir / "l_receiptdate.bin", std::ios::binary);
  std::ofstream mode(outdir / "l_shipmode.bin", std::ios::binary);
  std::ofstream part(outdir / "l_partkey.bin", std::ios::binary);
  std::ofstream qty(outdir / "l_quantity.bin", std::ios::binary);
  std::ofstream instr(outdir / "l_shipinstruct.bin", std::ios::binary);
  std::ofstream rflag(outdir / "l_returnflag.bin", std::ios::binary);
  std::string line;
  uint64_t row = 0;
  while (std::getline(f, line)) {
    auto c = split_fields(line);
    // TPC-H lineitem columns: 0 orderkey, 1 partkey, 4 quantity,
    // 8 returnflag, 10 shipdate, 11 commitdate, 12 receiptdate,
    // 13 shipinstruct, 14 shipmode
    put<uint32_t>(okey, std::stoul(std::string(c[0])));
    put<uint32_t>(okey, static_cast<uint32_t>(row));
    put<uint64_t>(ship, parse_date_epoch(c[10]));
    put<uint64_t>(commit, parse_date_epoch(c[11]));
    put<uint64_t>(receipt, parse_date_epoch(c[12]));
    put<uint8_t>(mode, shipmode_code(c[14]));
    put<uint32_t>(part, std::stoul(std::string(c[1])));
    put<float>(qty, std::stof(std::string(c[4])));
    put<uint8_t>(instr, shipinstruct_code(c[13]));
    put<uint8_t>(rflag, static_cast<uint8_t>(c[8].empty() ? 0 : c[8][0]));
    row++;
  }
  write_size(outdir, row);
  return row;
}

static uint64_t convert_orders(const fs::path &in, const fs::path &outdir) {
  fs::create_directories(outdir);
  std::ifstream f(in);
  if (!f) return 0;
  std::ofstream okey(outdir / "o_orderkey.bin", std::ios::binary);
  std::ofstream odate(outdir / "o_orderdate.bin", std::ios::binary);
  std::ofstream cust(outdir / "o_custkey.bin", std::ios::binary);
  std::string line;
  uint64_t row = 0;
  while (std::getline(f, line)) {
    auto c = split_fields(line);
    // orders: 0 orderkey, 1 custkey, 4 orderdate
    put<uint32_t>(okey, std::stoul(std::string(c[0])));
    put<uint32_t>(okey, static_cast<uint32_t>(row));
    put<uint64_t>(odate, parse_date_epoch(c[4]));
    put<uint32_t>(cust, std::stoul(std::string(c[1])));
    row++;
  }
  write_size(outdir, row);
  return row;
}

static uint64_t convert_customer(const fs::path &in, const fs::path &outdir) {
  fs::create_directories(outdir);
  std::ifstream f(in);
  if (!f) return 0;
  std::ofstream ckey(outdir / "c_custkey.bin", std::ios::binary);
  std::ofstream seg(outdir / "c_mktsegment.bin", std::ios::binary);
  std::ofstream nat(outdir / "c_nationkey.bin", std::ios::binary);
  std::string line;
  uint64_t row = 0;
  while (std::getline(f, line)) {
    auto c = split_fields(line);
    // customer: 0 custkey, 3 nationkey, 6 mktsegment
    put<uint32_t>(ckey, std::stoul(std::string(c[0])));
    put<uint32_t>(ckey, static_cast<uint32_t>(row));
    put<uint8_t>(seg, mktsegment_code(c[6]));
    put<uint32_t>(nat, std::stoul(std::string(c[3])));
    row++;
  }
  write_size(outdir, row);
  return row;
}

static uint64_t convert_part(const fs::path &in, const fs::path &outdir) {
  fs::create_directories(outdir);
  std::ifstream f(in);
  if (!f) return 0;
  std::ofstream pkey(outdir / "p_partkey.bin", std::ios::binary);
  std::ofstream brand(outdir / "p_brand.bin", std::ios::binary);
  std::ofstream size(outdir / "p_size.bin", std::ios::binary);
  std::ofstream cont(outdir / "p_container.bin", std::ios::binary);
  std::string line;
  uint64_t row = 0;
  while (std::getline(f, line)) {
    auto c = split_fields(line);
    // part: 0 partkey, 3 brand, 5 size, 6 container
    put<uint32_t>(pkey, std::stoul(std::string(c[0])));
    put<uint32_t>(pkey, static_cast<uint32_t>(row));
    put<uint8_t>(brand, brand_code(c[3]));
    put<uint32_t>(size, std::stoul(std::string(c[5])));
    put<uint8_t>(cont, container_code(c[6]));
    row++;
  }
  write_size(outdir, row);
  return row;
}

static uint64_t convert_nation(const fs::path &in, const fs::path &outdir) {
  fs::create_directories(outdir);
  std::ifstream f(in);
  if (!f) return 0;
  std::ofstream nkey(outdir / "n_nationkey.bin", std::ios::binary);
  std::string line;
  uint64_t row = 0;
  while (std::getline(f, line)) {
    auto c = split_fields(line);
    put<uint32_t>(nkey, std::stoul(std::string(c[0])));
    put<uint32_t>(nkey, static_cast<uint32_t>(row));
    row++;
  }
  write_size(outdir, row);
  return row;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::cerr << "usage: csv_convert <tbl_dir> <out_base_dir>\n";
    return 1;
  }
  fs::path in{argv[1]}, out{argv[2]};
  fs::create_directories(out);
  std::cout << "lineitem: "
            << convert_lineitem(in / "lineitem.tbl", out / "lineitem.tbl.dir")
            << "\n";
  std::cout << "orders: "
            << convert_orders(in / "orders.tbl", out / "orders.tbl.dir") << "\n";
  std::cout << "customer: "
            << convert_customer(in / "customer.tbl", out / "customer.tbl.dir")
            << "\n";
  std::cout << "part: " << convert_part(in / "part.tbl", out / "part.tbl.dir")
            << "\n";
  std::cout << "nation: "
            << convert_nation(in / "nation.tbl", out / "nation.tbl.dir") << "\n";
  return 0;
}
