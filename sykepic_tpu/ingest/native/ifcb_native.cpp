// Native hot-path helpers for the IFCB ingest/runtime layer.
//
// The reference is pure Python and pays for it on the host side (ADC CSV
// parsing with per-line str.split and a million snprintf-equivalent format
// calls per probability CSV tree). These are the measured host bottlenecks
// of the TPU pipeline once device compute is fast, so they live in C++
// (loaded via ctypes; pure-NumPy fallbacks remain in the Python layer).
//
// Build: `make` in this directory -> libifcb_native.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

extern "C" {

// Number of newline-delimited rows in a buffer (trailing line without \n
// counts).
long long adc_count_rows(const char* buf, long long len) {
    long long rows = 0;
    bool in_line = false;
    for (long long i = 0; i < len; ++i) {
        if (buf[i] == '\n') {
            rows += 1;
            in_line = false;
        } else if (!in_line) {
            in_line = true;
        }
    }
    if (in_line) rows += 1;
    return rows;
}

// Parse columns 15 (ROI width), 16 (height), 17 (start byte) of every row.
// Empty rows yield zeros. Returns rows parsed, or -1 if a row has fewer
// than 18 columns.
long long adc_parse(const char* buf, long long len, long long* widths,
                    long long* heights, long long* starts,
                    long long max_rows) {
    long long row = 0;
    long long i = 0;
    while (i < len && row < max_rows) {
        // empty line
        if (buf[i] == '\n') {
            widths[row] = heights[row] = starts[row] = 0;
            ++row;
            ++i;
            continue;
        }
        // scan to column 15
        long long col = 0;
        long long field_start = i;
        long long w = 0, h = 0, s = 0;
        bool ok = false;
        while (i <= len) {
            char ch = (i < len) ? buf[i] : '\n';
            if (ch == ',' || ch == '\n' || ch == '\r') {
                if (col == 15) {
                    w = strtoll(buf + field_start, nullptr, 10);
                } else if (col == 16) {
                    h = strtoll(buf + field_start, nullptr, 10);
                } else if (col == 17) {
                    // start byte may be written with decimals
                    s = (long long)strtod(buf + field_start, nullptr);
                    ok = true;
                }
                ++col;
                field_start = i + 1;
                if (ch == '\n') {
                    ++i;
                    break;
                }
                if (ch == '\r') {
                    // swallow \r\n
                    if (i + 1 < len && buf[i + 1] == '\n') ++i;
                    ++i;
                    break;
                }
            }
            ++i;
        }
        if (!ok) return -1;
        widths[row] = w;
        heights[row] = h;
        starts[row] = s;
        ++row;
    }
    return row;
}

// Format probability CSV rows: "<roi>,<p0>,...,<pC-1>\n" with 5-decimal
// probabilities (matches Python f"{p:.5f}": glibc printf is correctly
// rounded). Returns bytes written, or -1 if out_cap would overflow.
long long format_probs(const long long* roi_ids, const double* probs,
                       long long n, long long c, char* out,
                       long long out_cap) {
    long long pos = 0;
    for (long long i = 0; i < n; ++i) {
        if (pos + 24 + c * 8 > out_cap) return -1;
        pos += snprintf(out + pos, (size_t)(out_cap - pos), "%lld",
                        roi_ids[i]);
        const double* row = probs + i * c;
        for (long long j = 0; j < c; ++j) {
            out[pos++] = ',';
            pos += snprintf(out + pos, (size_t)(out_cap - pos), "%.5f",
                            row[j]);
        }
        out[pos++] = '\n';
    }
    return pos;
}

}  // extern "C"
