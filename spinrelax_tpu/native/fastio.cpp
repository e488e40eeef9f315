// fastio: high-throughput numeric text table parsing for trajectory-scale
// inputs (PLUMED colvars, xvg tables).
//
// The reference parses colvar files token-by-token in Python
// (plumedcolvario.py:24-81) — ~50 MB/s at best.  This parser mmaps the
// file and runs a single strtod sweep, reaching several hundred MB/s on
// one core, and is exposed through a plain C ABI consumed via ctypes
// (no pybind11 dependency).
//
// Build: see build.sh (g++ -O3 -shared -fPIC fastio.cpp -o libfastio.so)

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Count data rows/cols of a whitespace-separated numeric table.
// Lines whose first non-blank character is in `skip_chars` are ignored.
// Returns 0 on success, negative errno-style codes on failure.
// n_cols is taken from the first data line; ragged rows cause -2.
int fastio_table_dims(const char* path, const char* skip_chars,
                      long* n_rows, long* n_cols);

// Parse into a caller-allocated row-major double buffer of
// n_rows*n_cols.  Returns number of values written, or negative code.
long fastio_parse_table(const char* path, const char* skip_chars,
                        double* out, long n_rows, long n_cols);

// Count '#! FIELDS' headers in a PLUMED colvar (replica chunks).
int fastio_count_fields_headers(const char* path, long* n_headers);

// Bulk "%16g"-formatted table writer (PLUMED-style colvar rows; the
// write-side counterpart of the parser: np.savetxt's per-row Python
// formatting dominates the orientation stage at 10^6 frames).
// append != 0 appends.  Returns 0 on success, -1 on I/O failure.
int fastio_write_table(const char* path, int append, const double* data,
                       long n_rows, long n_cols);
}

namespace {

struct MappedFile {
    const char* data = nullptr;
    size_t size = 0;
    int fd = -1;

    bool open_file(const char* path) {
        fd = ::open(path, O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        // On failure, reset fd before returning: the destructor also
        // closes, and a double ::close could destroy another thread's
        // recycled descriptor (the threaded XTC workers open files
        // concurrently).
        if (fstat(fd, &st) != 0) { ::close(fd); fd = -1; return false; }
        size = static_cast<size_t>(st.st_size);
        if (size == 0) { data = nullptr; return true; }
        void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
        if (p == MAP_FAILED) { ::close(fd); fd = -1; return false; }
        data = static_cast<const char*>(p);
        // Sequential advisory: big linear sweep.
        madvise(const_cast<char*>(data), size, MADV_SEQUENTIAL);
        return true;
    }

    ~MappedFile() {
        if (data) munmap(const_cast<char*>(data), size);
        if (fd >= 0) ::close(fd);
    }
};

inline bool is_blank(char c) { return c == ' ' || c == '\t' || c == '\r'; }

inline const char* skip_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

}  // namespace

// strtod on a non-NUL-terminated mapping may walk past the final page
// when the file size is an exact page multiple: raw strtod is safe only
// when a terminator byte (whitespace/newline — anything non-numeric)
// provably exists before `end`.  A fixed "last 32 bytes" window is NOT
// enough: a >=32-char final token (e.g. '%.25e' output) with no trailing
// newline still scans one past the mapping.  Copy-terminate whenever the
// token itself reaches `end`.
static inline bool strtod_char(char c) {
    // Superset of bytes strtod can consume (digits, sign, dot, exponent,
    // hex/inf/nan letters) — anything else terminates its scan in-bounds.
    return (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.' ||
           (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}

static double safe_strtod(const char* p, const char* end, char** next) {
    const char* q = p;
    while (q < end && strtod_char(*q)) ++q;
    if (q < end) return strtod(p, next);  // in-bounds terminator exists
    char tmp[64];
    size_t n = (size_t)(end - p);
    if (n >= sizeof tmp) n = sizeof tmp - 1;  // token longer than any real number
    memcpy(tmp, p, n);
    tmp[n] = 0;
    char* nx = nullptr;
    double v = strtod(tmp, &nx);
    *next = (char*)p + (nx - tmp);
    return v;
}

int fastio_table_dims(const char* path, const char* skip_chars,
                      long* n_rows, long* n_cols) {
    MappedFile mf;
    if (!mf.open_file(path)) return -1;
    const char* p = mf.data;
    const char* end = mf.data + mf.size;
    long rows = 0, cols = 0;
    while (p < end) {
        while (p < end && is_blank(*p)) ++p;
        if (p >= end) break;
        if (*p == '\n') { ++p; continue; }
        if (strchr(skip_chars, *p)) { p = skip_line(p, end); continue; }
        // Data line: count columns on the first one.
        if (cols == 0) {
            const char* q = p;
            long c = 0;
            while (q < end && *q != '\n') {
                while (q < end && is_blank(*q)) ++q;
                if (q >= end || *q == '\n') break;
                ++c;
                while (q < end && !is_blank(*q) && *q != '\n') ++q;
            }
            cols = c;
        }
        ++rows;
        p = skip_line(p, end);
    }
    *n_rows = rows;
    *n_cols = cols;
    return 0;
}

long fastio_parse_table(const char* path, const char* skip_chars,
                        double* out, long n_rows, long n_cols) {
    MappedFile mf;
    if (!mf.open_file(path)) return -1;
    const char* p = mf.data;
    const char* end = mf.data + mf.size;
    long written = 0;
    long row = 0;
    while (p < end && row < n_rows) {
        while (p < end && is_blank(*p)) ++p;
        if (p >= end) break;
        if (*p == '\n') { ++p; continue; }
        if (strchr(skip_chars, *p)) { p = skip_line(p, end); continue; }
        long col = 0;
        while (p < end && *p != '\n' && col < n_cols) {
            char* next = nullptr;
            double v = safe_strtod(p, end, &next);
            if (next == p) { return -2; }  // malformed token
            out[row * n_cols + col] = v;
            ++col;
            ++written;
            p = next;
            while (p < end && is_blank(*p)) ++p;
        }
        if (col != n_cols) return -3;  // ragged row (too few columns)
        if (p < end && *p != '\n' && *p != '\r') return -3;  // extra columns
        ++row;
        p = skip_line(p, end);
    }
    return written;
}

int fastio_write_table(const char* path, int append, const double* data,
                       long n_rows, long n_cols) {
    FILE* fp = fopen(path, append ? "ab" : "wb");
    if (!fp) return -1;
    const size_t CHUNK = 1 << 20;
    char* out = (char*)malloc(CHUNK + 4096);
    if (!out) { fclose(fp); return -1; }
    char buf[64];
    size_t off = 0;
    bool ok = true;
    for (long r = 0; r < n_rows && ok; r++) {
        for (long c = 0; c < n_cols && ok; c++) {
            int n = snprintf(buf, sizeof buf, c ? " %16g" : "%16g",
                             data[r * n_cols + c]);
            memcpy(out + off, buf, (size_t)n);
            off += (size_t)n;
            // Flush per VALUE: an end-of-row-only check would overflow
            // the fixed slack for wide tables (>= ~240 columns).
            if (off >= CHUNK) {
                ok = fwrite(out, 1, off, fp) == off;
                off = 0;
            }
        }
        out[off++] = '\n';
        if (off >= CHUNK) {
            ok = fwrite(out, 1, off, fp) == off;
            off = 0;
        }
    }
    if (ok && off) ok = fwrite(out, 1, off, fp) == off;
    free(out);
    int rc = fclose(fp);
    return (ok && rc == 0) ? 0 : -1;
}

int fastio_count_fields_headers(const char* path, long* n_headers) {
    MappedFile mf;
    if (!mf.open_file(path)) return -1;
    const char* p = mf.data;
    const char* end = mf.data + mf.size;
    long count = 0;
    while (p < end) {
        while (p < end && is_blank(*p)) ++p;
        if (p < end && *p == '#') {
            const char* q = p;
            const char* line_end = q;
            while (line_end < end && *line_end != '\n') ++line_end;
            // Match the Python readers exactly (parts[1] == 'FIELDS'):
            // FIELDS must be the SECOND whitespace token, not a
            // substring anywhere in the comment ('# note: FIELDS
            // unchanged' is not a header).
            while (q < line_end && !is_blank(*q)) ++q;  // skip '#!'/'#'
            while (q < line_end && is_blank(*q)) ++q;
            if (line_end - q >= 6 && memcmp(q, "FIELDS", 6) == 0 &&
                (q + 6 == line_end || is_blank(q[6])))
                ++count;
            p = line_end < end ? line_end + 1 : end;
            continue;
        }
        p = skip_line(p, end);
    }
    *n_headers = count;
    return 0;
}
