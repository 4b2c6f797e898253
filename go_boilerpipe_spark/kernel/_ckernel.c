/* _ckernel: compiled hot path of the boilerpipe kernel.
 *
 * A C port of the SAME semantics as the pure-Python modules (which are the
 * executable spec, kept as the fallback path):
 *   - htmltok.py   (x/net/html Tokenizer port)      -> the tag/text scanner
 *   - unescape.py  (escape.go unescape port)        -> go_unescape
 *   - handler.py   (content_handler.go port)        -> ContentHandler
 *   - document.py parse_to_handler (boilerpipe.go:108-158) -> parse loop
 *
 * Everything data-driven is injected from Python via init_tables() so the
 * Unicode classes (kernel/_unicode_classes.py), the entity table
 * (html.entities.html5), the tag-action map and the atom set are shared
 * with the pure path by construction.  Gate: tests/test_ckernel_parity.py
 * (golden 7/7 bytewise through BOTH paths + corpus/fuzz differentials).
 *
 * The input is a Python str; we take a UCS4 copy and scan uint32 arrays.
 * Lone surrogates (from surrogateescape decoding of invalid UTF-8) pass
 * through and count 1 byte in flush_block's byte-length gates, matching
 * the Python path's encode("utf-8","surrogateescape") arithmetic.
 *
 * Exposed:
 *   init_tables(cfg: dict)      -- must be called once before parse()
 *   parse(s: str) -> (title, blocks, ld_json, datetimes)
 *       blocks: list[(text, num_words, num_linked_words,
 *                     num_words_in_wrapped_lines, num_wrapped_lines,
 *                     offset, tag_level, labels_tuple)]
 *   unescape(s: str, attribute: bool=False) -> str   (for differentials)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

typedef uint32_t u32;

/* ------------------------------------------------------------------ */
/* growable UCS4 buffer                                                */
/* ------------------------------------------------------------------ */

typedef struct {
    u32 *p;
    Py_ssize_t len, cap;
} Buf;

static int buf_reserve(Buf *b, Py_ssize_t need)
{
    if (b->len + need <= b->cap)
        return 0;
    Py_ssize_t ncap = b->cap ? b->cap : 64;
    while (ncap < b->len + need)
        ncap *= 2;
    u32 *np = (u32 *)PyMem_Realloc(b->p, (size_t)ncap * sizeof(u32));
    if (!np) {
        PyErr_NoMemory();
        return -1;
    }
    b->p = np;
    b->cap = ncap;
    return 0;
}

static inline int buf_push(Buf *b, u32 c)
{
    if (b->len >= b->cap && buf_reserve(b, 1) < 0)
        return -1;
    b->p[b->len++] = c;
    return 0;
}

static inline int buf_extend(Buf *b, const u32 *src, Py_ssize_t n)
{
    if (n <= 0)
        return 0;
    if (buf_reserve(b, n) < 0)
        return -1;
    memcpy(b->p + b->len, src, (size_t)n * sizeof(u32));
    b->len += n;
    return 0;
}

static void buf_free(Buf *b)
{
    PyMem_Free(b->p);
    b->p = NULL;
    b->len = b->cap = 0;
}

typedef struct {
    char buf[64]; /* ascii-lowered name (valid when ascii && len<64) */
    Py_ssize_t len;
    int ascii;
} Name;


/* ------------------------------------------------------------------ */
/* injected tables                                                     */
/* ------------------------------------------------------------------ */

#define CP_MAX 0x110000

static unsigned char *g_word_bits;   /* \p{L}\p{Nd}\p{Nl}\p{No}  (is_word) */
static unsigned char *g_tokw_bits;   /* [\p{L}0-9_] (tokenize word runs)   */
static PyObject *g_entities;         /* html.entities.html5 dict            */
static u32 g_space[64];              /* GO_SPACE codepoints, sorted         */
static int g_nspace;
static int g_ready;

static inline int bit_test(const unsigned char *bits, u32 c)
{
    return c < CP_MAX && (bits[c >> 3] >> (c & 7)) & 1;
}

static inline int is_word_char(u32 c) { return bit_test(g_word_bits, c); }
static inline int is_tok_word(u32 c) { return bit_test(g_tokw_bits, c); }

static inline int is_go_space(u32 c)
{
    if (c < 0x80) /* ASCII fast path: \t..\r and ' ' */
        return (c >= 0x09 && c <= 0x0D) || c == 0x20;
    int lo = 0, hi = g_nspace - 1;
    while (lo <= hi) {
        int mid = (lo + hi) >> 1;
        if (g_space[mid] == c)
            return 1;
        if (g_space[mid] < c)
            lo = mid + 1;
        else
            hi = mid - 1;
    }
    return 0;
}

/* tag property table: open addressing on lowercase-ASCII names */

#define PROP_ATOM 1
#define PROP_RAW 2
#define PROP_RCDATA 4
#define PROP_SBSC 8     /* SHOULD_BE_SELF_CLOSING */
#define PROP_ATTRTAG 16 /* attrs extracted (script/time) */

/* tag action codes — handler.py:122-129 */
#define TA_NONE 0
#define TA_IGNORABLE 1
#define TA_ANCHOR 2
#define TA_BODY 3
#define TA_INLINE_WS 4
#define TA_INLINE_NO_WS 5
#define TA_BLOCK_LABEL 6
#define TA_VOID 7
#define TA_TIME 8

typedef struct {
    char *name; /* lowercase ascii, NUL-terminated */
    int len;
    int props;
    int action;
    int atom_id; /* >0 when PROP_ATOM */
    int labels[2];
    int nlabels;
} TagEnt;

#define TAG_HASH_SIZE 2048 /* > 2x entries, power of two */
static TagEnt g_tags[TAG_HASH_SIZE];
static int g_atom_count;

static unsigned tag_hash(const char *s, int n)
{
    unsigned h = 2166136261u;
    for (int i = 0; i < n; i++) {
        h ^= (unsigned char)s[i];
        h *= 16777619u;
    }
    return h;
}

static TagEnt *tag_slot(const char *s, int n)
{
    unsigned idx = tag_hash(s, n) & (TAG_HASH_SIZE - 1);
    for (;;) {
        TagEnt *e = &g_tags[idx];
        if (!e->name)
            return e; /* empty slot (insert point / not found) */
        if (e->len == n && memcmp(e->name, s, (size_t)n) == 0)
            return e;
        idx = (idx + 1) & (TAG_HASH_SIZE - 1);
    }
}

/* lookup from a UCS4 slice; names are ASCII — any char >127 => unknown */
static TagEnt *tag_lookup_u32(const u32 *s, Py_ssize_t n)
{
    char tmp[32];
    if (n <= 0 || n > 31)
        return NULL;
    for (Py_ssize_t i = 0; i < n; i++) {
        if (s[i] > 127)
            return NULL;
        tmp[i] = (char)s[i];
    }
    TagEnt *e = tag_slot(tmp, (int)n);
    return e->name ? e : NULL;
}

static int tag_insert(const char *s, Py_ssize_t n)
{
    /* returns index into g_tags (creating the entry when absent) */
    TagEnt *e = tag_slot(s, (int)n);
    if (!e->name) {
        e->name = (char *)PyMem_Malloc((size_t)n + 1);
        if (!e->name) {
            PyErr_NoMemory();
            return -1;
        }
        memcpy(e->name, s, (size_t)n);
        e->name[n] = 0;
        e->len = (int)n;
    }
    return (int)(e - g_tags);
}

/* ------------------------------------------------------------------ */
/* go_unescape — unescape.py port (escape.go semantics)                */
/* ------------------------------------------------------------------ */

/* escape.go replacementTable (unescape.py:28-34), '' slots keep the cp */
static const u32 REPLACEMENT_TABLE[32] = {
    0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
    0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178,
};

#define LONGEST_NO_SEMI 6

/* append the UCS4 chars of a python str `rep` to out */
static int append_pystr(Buf *out, PyObject *rep)
{
    Py_ssize_t m = PyUnicode_GET_LENGTH(rep);
    for (Py_ssize_t t = 0; t < m; t++)
        if (buf_push(out, (u32)PyUnicode_READ_CHAR(rep, t)) < 0)
            return -1;
    return 0;
}

/* entity lookup: name chars are ASCII alnum (+ optional ';') */
static PyObject *entity_get(const u32 *s, Py_ssize_t n)
{
    char tmp[40];
    if (n <= 0 || n > 39)
        return NULL;
    for (Py_ssize_t i = 0; i < n; i++)
        tmp[i] = (char)s[i];
    PyObject *key = PyUnicode_FromStringAndSize(tmp, n);
    if (!key)
        return NULL; /* propagates MemoryError */
    PyObject *rep = PyDict_GetItem(g_entities, key); /* borrowed */
    Py_DECREF(key);
    return rep;
}

/* unescape.py:39-115 _entity: parse one reference at s[src]=='&'.
 * Appends the replacement to out; returns next src, or -1 on error. */
static Py_ssize_t entity_one(const u32 *s, Py_ssize_t src, Py_ssize_t n,
                             int attribute, Buf *out)
{
    if (src + 1 >= n)
        return buf_push(out, '&') < 0 ? -1 : src + 1;
    u32 c = s[src + 1];

    if (c == '#') {
        if (n - src <= 3)
            return buf_push(out, '&') < 0 ? -1 : src + 1;
        Py_ssize_t i = 2;
        int hexmode = 0;
        if (s[src + 2] == 'x' || s[src + 2] == 'X') {
            hexmode = 1;
            i = 3;
        }
        uint32_t x = 0;
        while (src + i < n) {
            c = s[src + i];
            i++;
            if (hexmode) {
                if (c >= '0' && c <= '9') {
                    x = (16 * x + c - 48); /* uint32 wraps mod 2^32 */
                    continue;
                }
                if (c >= 'a' && c <= 'f') {
                    x = (16 * x + c - 87);
                    continue;
                }
                if (c >= 'A' && c <= 'F') {
                    x = (16 * x + c - 55);
                    continue;
                }
            } else if (c >= '0' && c <= '9') {
                x = (10 * x + c - 48);
                continue;
            }
            if (c != ';')
                i--;
            break;
        }
        if (i <= 3) /* no digits matched */
            return buf_push(out, '&') < 0 ? -1 : src + 1;
        if (x >= 0x80000000u) /* Go rune (int32) went negative */
            x = 0xFFFD;
        else if (x >= 0x80 && x <= 0x9F)
            x = REPLACEMENT_TABLE[x - 0x80];
        else if (x == 0 || (x >= 0xD800 && x <= 0xDFFF) || x > 0x10FFFF)
            x = 0xFFFD;
        return buf_push(out, x) < 0 ? -1 : src + i;
    }

    /* named reference: consume [a-zA-Z0-9]* and an optional ';' */
    Py_ssize_t i = 1;
    while (src + i < n) {
        c = s[src + i];
        i++;
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9'))
            continue;
        if (c != ';')
            i--;
        break;
    }
    const u32 *name = s + src + 1;
    Py_ssize_t name_len = i - 1;
    if (name_len == 0) {
        /* fall through to literal copy */
    } else if (attribute && name[name_len - 1] != ';' && src + i < n &&
               s[src + i] == '=') {
        /* attribute quirk: &name= stays literal */
    } else {
        PyObject *rep = entity_get(name, name_len);
        if (!rep && PyErr_Occurred())
            return -1;
        if (rep) {
            if (append_pystr(out, rep) < 0)
                return -1;
            return src + i;
        }
        if (!attribute) {
            Py_ssize_t max_len = name_len - 1;
            if (max_len > LONGEST_NO_SEMI)
                max_len = LONGEST_NO_SEMI;
            for (Py_ssize_t j = max_len; j > 1; j--) {
                rep = entity_get(name, j);
                if (!rep && PyErr_Occurred())
                    return -1;
                if (rep) {
                    if (append_pystr(out, rep) < 0)
                        return -1;
                    return src + j + 1;
                }
            }
        }
    }
    if (buf_extend(out, s + src, i) < 0)
        return -1;
    return src + i;
}

/* unescape.py:118-134 go_unescape: returns 0 ok / -1 error.
 * Appends the unescaped text to out (does not clear out). */
static int go_unescape_u32(const u32 *s, Py_ssize_t n, int attribute,
                           Buf *out)
{
    Py_ssize_t i = 0;
    while (i < n && s[i] != '&')
        i++;
    if (buf_extend(out, s, i) < 0)
        return -1;
    while (i < n) {
        Py_ssize_t j = entity_one(s, i, n, attribute, out);
        if (j < 0)
            return -1;
        i = j;
        Py_ssize_t k = i;
        while (k < n && s[k] != '&')
            k++;
        if (buf_extend(out, s + i, k - i) < 0)
            return -1;
        i = k;
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* text preprocessing: _convert_newlines (+ optional unescape / NUL)   */
/* ------------------------------------------------------------------ */

/* htmltok.py:88-91: \r\n -> \n, \r -> \n.  Appends into out. */
static int convert_newlines(const u32 *s, Py_ssize_t n, Buf *out)
{
    if (buf_reserve(out, n) < 0)
        return -1;
    for (Py_ssize_t i = 0; i < n; i++) {
        u32 c = s[i];
        if (c == '\r') {
            if (i + 1 < n && s[i + 1] == '\n')
                i++;
            c = '\n';
        }
        out->p[out->len++] = c;
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* ContentHandler — handler.py port                                    */
/* ------------------------------------------------------------------ */

/* label enum values injected per tag at init (textblock.py:15-23) */

typedef struct {
    Buf token_buf;
    Buf text_buf;
    Buf scratch;  /* tokenize output / collapsed text reuse */
    int depth_body, depth_anchor, depth_ignoreable, depth_tag;
    int depth_block_tag;
    int last_was_whitespace;
    int flush;
    int in_anchor_text;
    int offset_blocks;
    int *label_stack;
    Py_ssize_t label_len, label_cap;
    int *atom_stack;
    Py_ssize_t atom_len, atom_cap;
    char last_start_tag[32];
    int last_start_len;
    PyObject *blocks;    /* list */
    PyObject *ld_json;   /* list of str */
    PyObject *datetimes; /* list of str */
    PyObject *title;     /* str or NULL */
    int in_ld_json;
} Handler;

static int h_init(Handler *h)
{
    memset(h, 0, sizeof(*h));
    h->depth_block_tag = -1;
    h->blocks = PyList_New(0);
    h->ld_json = PyList_New(0);
    h->datetimes = PyList_New(0);
    if (!h->blocks || !h->ld_json || !h->datetimes)
        return -1;
    return 0;
}

static void h_free(Handler *h)
{
    buf_free(&h->token_buf);
    buf_free(&h->text_buf);
    buf_free(&h->scratch);
    PyMem_Free(h->label_stack);
    PyMem_Free(h->atom_stack);
    Py_XDECREF(h->blocks);
    Py_XDECREF(h->ld_json);
    Py_XDECREF(h->datetimes);
    Py_XDECREF(h->title);
}

static int ipush(int **arr, Py_ssize_t *len, Py_ssize_t *cap, int v)
{
    if (*len >= *cap) {
        Py_ssize_t nc = *cap ? *cap * 2 : 16;
        int *np = (int *)PyMem_Realloc(*arr, (size_t)nc * sizeof(int));
        if (!np) {
            PyErr_NoMemory();
            return -1;
        }
        *arr = np;
        *cap = nc;
    }
    (*arr)[(*len)++] = v;
    return 0;
}

/* go_trim_space bounds: [*a, *b) trimmed of GO_SPACE */
static void trim_go_space(const u32 *s, Py_ssize_t *a, Py_ssize_t *b)
{
    while (*a < *b && is_go_space(s[*a]))
        (*a)++;
    while (*b > *a && is_go_space(s[*b - 1]))
        (*b)--;
}

/* token punctuation set — handler.py:66 _TOKEN_PUNCT */
static inline int is_tok_punct(u32 c)
{
    switch (c) {
    case '"': case '\'': case '.': case ',': case '!': case '@':
    case '-': case ':': case ';': case '$': case '?': case '(':
    case ')': case '/':
        return 1;
    default:
        return 0;
    }
}

#define INVIS 0x2063u

/* handler.py _junction_slow: the original marker-machine regexes over a
 * junction piece with word-adjacent edge markers attached.  Appends the
 * processed piece to out.  NOT_WORD_BOUNDARY = INVIS*(punct)INVIS* -> punct;
 * then INVIS+ -> ' '. */
static int junction_slow(const u32 *p, Py_ssize_t n, int lead, int trail,
                         Buf *out)
{
    /* build decorated piece in a small stack/heap buffer */
    Py_ssize_t dn = n + (lead ? 1 : 0) + (trail ? 1 : 0);
    u32 small[64];
    u32 *d = small;
    if (dn > 64) {
        d = (u32 *)PyMem_Malloc((size_t)dn * sizeof(u32));
        if (!d) {
            PyErr_NoMemory();
            return -1;
        }
    }
    Py_ssize_t m = 0;
    if (lead)
        d[m++] = INVIS;
    memcpy(d + m, p, (size_t)n * sizeof(u32));
    m += n;
    if (trail)
        d[m++] = INVIS;

    /* pass 1+2 fused walk */
    int rc = 0;
    Py_ssize_t i = 0;
    while (i < m) {
        u32 c = d[i];
        if (c == INVIS) {
            Py_ssize_t j = i;
            while (j < m && d[j] == INVIS)
                j++;
            if (j < m && is_tok_punct(d[j])) {
                /* INVIS*(punct)INVIS* -> punct */
                if (buf_push(out, d[j]) < 0) { rc = -1; break; }
                j++;
                while (j < m && d[j] == INVIS)
                    j++;
                i = j;
            } else {
                /* surviving marker run -> one space */
                if (buf_push(out, ' ') < 0) { rc = -1; break; }
                i = j;
            }
        } else if (is_tok_punct(c)) {
            /* zero-leading-marker match still consumes a trailing run */
            if (buf_push(out, c) < 0) { rc = -1; break; }
            i++;
            while (i < m && d[i] == INVIS)
                i++;
        } else {
            if (buf_push(out, c) < 0) { rc = -1; break; }
            i++;
        }
    }
    if (d != small)
        PyMem_Free(d);
    return rc;
}

static int slice_has_invis(const u32 *s, Py_ssize_t a, Py_ssize_t b)
{
    for (Py_ssize_t i = a; i < b; i++)
        if (s[i] == INVIS)
            return 1;
    return 0;
}

/* handler.py:80-170 tokenize(): write the junction-walk result into
 * h->scratch (cleared first).  The caller then splits on ' '. */
static int tokenize_to_scratch(Handler *h, const u32 *s0, Py_ssize_t n0)
{
    Buf *out = &h->scratch;
    out->len = 0;
    Py_ssize_t a = 0, b = n0;
    trim_go_space(s0, &a, &b);
    const u32 *s = s0 + a;
    Py_ssize_t n = b - a;

    /* find first word run */
    Py_ssize_t w0 = 0;
    while (w0 < n && !is_tok_word(s[w0]))
        w0++;
    if (w0 == n) {
        /* no words: punct-marker + marker-run passes apply to literal
         * U+2063, then the space split (handler.py np==1 branch) */
        if (slice_has_invis(s, 0, n))
            return junction_slow(s, n, 0, 0, out);
        return buf_extend(out, s, n);
    }

    /* leading piece s[0:w0] (trailing marker only) */
    if (slice_has_invis(s, 0, w0)) {
        if (junction_slow(s, w0, 0, 1, out) < 0)
            return -1;
    } else {
        if (buf_extend(out, s, w0) < 0)
            return -1;
        if (!(w0 > 0 && is_tok_punct(s[w0 - 1])))
            if (buf_push(out, ' ') < 0)
                return -1;
    }

    Py_ssize_t i = w0;
    for (;;) {
        /* word run [i, j) */
        Py_ssize_t j = i;
        while (j < n && is_tok_word(s[j]))
            j++;
        if (buf_extend(out, s + i, j - i) < 0)
            return -1;
        if (j >= n)
            break; /* text ends with a word: trailing piece empty */
        /* junction piece [j, k): up to next word run or end */
        Py_ssize_t k = j;
        while (k < n && !is_tok_word(s[k]))
            k++;
        int is_last = (k >= n);
        if (slice_has_invis(s, j, k)) {
            if (junction_slow(s + j, k - j, 1, is_last ? 0 : 1, out) < 0)
                return -1;
        } else if (is_last) {
            /* trailing piece: only its leading edge touches a marker */
            if (!(k > j && is_tok_punct(s[j])))
                if (buf_push(out, ' ') < 0)
                    return -1;
            if (buf_extend(out, s + j, k - j) < 0)
                return -1;
        } else {
            /* interior junction: both edges touch markers */
            if (!is_tok_punct(s[j]))
                if (buf_push(out, ' ') < 0)
                    return -1;
            if (buf_extend(out, s + j, k - j) < 0)
                return -1;
            if (!is_tok_punct(s[k - 1]))
                if (buf_push(out, ' ') < 0)
                    return -1;
        }
        if (is_last)
            break;
        i = k;
    }
    return 0;
}

/* utf-8 byte length of the token buffer (handler.py:385-389): lone
 * surrogateescape surrogates (DC80-DCFF) round-trip to ONE raw byte. */
static Py_ssize_t utf8_byte_len(const u32 *s, Py_ssize_t n)
{
    Py_ssize_t b = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        u32 c = s[i];
        if (c < 0x80)
            b += 1;
        else if (c < 0x800)
            b += 2;
        else if (c >= 0xDC80 && c <= 0xDCFF)
            b += 1; /* surrogateescape byte */
        else if (c < 0x10000)
            b += 3;
        else
            b += 4;
    }
    return b;
}

static PyObject *str_from_u32(const u32 *s, Py_ssize_t n)
{
    return PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, s, n);
}

/* handler.py:364-466 flush_block */
static int flush_block(Handler *h)
{
    if (h->token_buf.len == 0)
        return 0;
    const u32 *ts = h->token_buf.p;
    Py_ssize_t tn = h->token_buf.len;

    if (h->depth_body == 0) {
        if (h->last_start_len == 5 &&
            memcmp(h->last_start_tag, "title", 5) == 0) {
            Py_ssize_t a = 0, b = tn;
            trim_go_space(ts, &a, &b);
            if (b > a) {
                PyObject *t = str_from_u32(ts + a, b - a);
                if (!t)
                    return -1;
                Py_XDECREF(h->title);
                h->title = t;
            }
        }
        h->text_buf.len = 0;
        h->token_buf.len = 0;
        return 0;
    }

    Py_ssize_t blen = utf8_byte_len(ts, tn);
    if (blen == 0)
        return 0;
    if (blen == 1 && h->last_was_whitespace) {
        h->text_buf.len = 0;
        h->token_buf.len = 0;
        return 0;
    }

    if (tokenize_to_scratch(h, ts, tn) < 0)
        return -1;

    /* strip + split(' ') over scratch, counting (handler.py:397-427) */
    Py_ssize_t a = 0, b = h->scratch.len;
    trim_go_space(h->scratch.p, &a, &b);
    const u32 *tk = h->scratch.p;

    long num_words = 0, num_linked_words = 0, num_wrapped_lines = 0;
    long num_tokens = 0, num_words_current_line = 0;
    long current_line_length = -1; /* don't count the first space */
    int in_anchor = h->in_anchor_text;

    if (a >= b) {
        /* tokenize returned [""]: one empty non-word token */
        num_tokens = 1;
    } else {
        Py_ssize_t i = a;
        while (i < b) {
            while (i < b && tk[i] == ' ')
                i++;
            if (i >= b)
                break;
            Py_ssize_t j = i;
            while (j < b && tk[j] != ' ')
                j++;
            Py_ssize_t L = j - i;
            if (L == 2 && tk[i] == '$' && tk[i + 1] == '<') {
                in_anchor = 1;
            } else if (L == 2 && tk[i] == '>' && tk[i + 1] == '$') {
                in_anchor = 0;
            } else {
                int has_word = 0;
                for (Py_ssize_t t = i; t < j; t++)
                    if (is_word_char(tk[t])) {
                        has_word = 1;
                        break;
                    }
                if (has_word) {
                    num_tokens++;
                    num_words++;
                    num_words_current_line++;
                    if (in_anchor)
                        num_linked_words++;
                    current_line_length += L + 1;
                    if (current_line_length > 80) { /* max line length */
                        num_wrapped_lines++;
                        current_line_length = L;
                        num_words_current_line = 1;
                    }
                } else {
                    num_tokens++;
                }
            }
            i = j;
        }
    }
    h->in_anchor_text = in_anchor;

    if (num_tokens == 0)
        /* Go-port quirk: buffers NOT reset (content_handler.go:328-330) */
        return 0;

    long num_words_in_wrapped_lines;
    if (num_wrapped_lines == 0) {
        num_words_in_wrapped_lines = num_words;
        num_wrapped_lines = 1;
    } else {
        num_words_in_wrapped_lines = num_words - num_words_current_line;
    }

    Py_ssize_t xa = 0, xb = h->text_buf.len;
    trim_go_space(h->text_buf.p, &xa, &xb);

    if (xb > xa) {
        if (num_words_in_wrapped_lines == 0) {
            num_words_in_wrapped_lines = num_words;
            num_wrapped_lines = 1;
        }
        PyObject *text = str_from_u32(h->text_buf.p + xa, xb - xa);
        if (!text)
            return -1;
        /* labelStack.PopAll() returns reverse order (textblock.go:47-60) */
        PyObject *labels = PyTuple_New(h->label_len);
        if (!labels) {
            Py_DECREF(text);
            return -1;
        }
        for (Py_ssize_t t = 0; t < h->label_len; t++) {
            PyObject *lv =
                PyLong_FromLong(h->label_stack[h->label_len - 1 - t]);
            if (!lv) {
                Py_DECREF(text);
                Py_DECREF(labels);
                return -1;
            }
            PyTuple_SET_ITEM(labels, t, lv);
        }
        h->label_len = 0;
        PyObject *blk = Py_BuildValue(
            "(NlllllliN)", text, num_words, num_linked_words,
            num_words_in_wrapped_lines, num_wrapped_lines,
            (long)h->offset_blocks, (long)h->offset_blocks,
            h->depth_block_tag, labels);
        if (!blk)
            return -1;
        int rc = PyList_Append(h->blocks, blk);
        Py_DECREF(blk);
        if (rc < 0)
            return -1;
        h->offset_blocks++;
    }

    h->text_buf.len = 0;
    h->token_buf.len = 0;
    h->depth_block_tag = -1;
    return 0;
}

/* handler.py:356-360 */
static int add_ws_if_necessary(Handler *h)
{
    if (!h->last_was_whitespace) {
        if (buf_push(&h->token_buf, ' ') < 0 ||
            buf_push(&h->text_buf, ' ') < 0)
            return -1;
        h->last_was_whitespace = 1;
    }
    return 0;
}

/* handler.py:301-354 text_token; d may alias h->scratch (flush first!) */
static int text_token(Handler *h, const u32 *d, Py_ssize_t n)
{
    if (h->flush) {
        if (h->token_buf.len && flush_block(h) < 0)
            return -1;
        h->flush = 0;
    }
    if (h->depth_ignoreable != 0)
        return 0;
    if (n == 0)
        return 0;

    /* fast path: all-whitespace tokens */
    int all_space = 1;
    for (Py_ssize_t i = 0; i < n; i++)
        if (!is_go_space(d[i])) {
            all_space = 0;
            break;
        }
    if (all_space) {
        if (!h->last_was_whitespace) {
            if (buf_push(&h->text_buf, ' ') < 0 ||
                buf_push(&h->token_buf, ' ') < 0)
                return -1;
            h->last_was_whitespace = 1;
        }
        return 0;
    }

    int was_first = is_go_space(d[0]);
    int was_last = is_go_space(d[n - 1]);

    /* spaceRemover: collapse runs to ' ', strip — into scratch
     * (free here: any pending flush already consumed it above) */
    Buf *sc = &h->scratch;
    sc->len = 0;
    if (buf_reserve(sc, n) < 0)
        return -1;
    int pending = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        u32 c = d[i];
        if (is_go_space(c)) {
            if (sc->len)
                pending = 1;
        } else {
            if (pending) {
                sc->p[sc->len++] = ' ';
                pending = 0;
            }
            sc->p[sc->len++] = c;
        }
    }

    if (sc->len == 0) {
        if (was_first || was_last) {
            if (!h->last_was_whitespace) {
                if (buf_push(&h->text_buf, ' ') < 0 ||
                    buf_push(&h->token_buf, ' ') < 0)
                    return -1;
            }
            h->last_was_whitespace = 1;
        } else {
            h->last_was_whitespace = 0;
        }
        return 0;
    }

    if (was_first && !h->last_was_whitespace) {
        if (buf_push(&h->text_buf, ' ') < 0 ||
            buf_push(&h->token_buf, ' ') < 0)
            return -1;
    }
    if (h->depth_block_tag == -1)
        h->depth_block_tag = h->depth_tag;

    if (buf_extend(&h->text_buf, sc->p, sc->len) < 0 ||
        buf_extend(&h->token_buf, sc->p, sc->len) < 0)
        return -1;
    if (was_last) {
        if (buf_push(&h->text_buf, ' ') < 0 ||
            buf_push(&h->token_buf, ' ') < 0)
            return -1;
    }
    h->last_was_whitespace = was_last;
    return 0;
}

/* handler.py:132 — actions that change tag level */
static inline int changes_tag_level(int ta)
{
    return ta == TA_IGNORABLE || ta == TA_ANCHOR || ta == TA_BODY ||
           ta == TA_BLOCK_LABEL || ta == TA_TIME;
}

/* handler.py:246-272 _action_start: returns flush bool or -1 */
static int action_start(Handler *h, int ta, const TagEnt *e)
{
    switch (ta) {
    case TA_IGNORABLE:
        h->depth_ignoreable++;
        return 1;
    case TA_ANCHOR:
        h->depth_anchor++;
        if (h->depth_ignoreable == 0) {
            if (add_ws_if_necessary(h) < 0)
                return -1;
            if (buf_push(&h->token_buf, '$') < 0 ||
                buf_push(&h->token_buf, '<') < 0 ||
                buf_push(&h->token_buf, ' ') < 0)
                return -1;
            h->last_was_whitespace = 1;
        }
        return 0;
    case TA_BODY:
        if (flush_block(h) < 0)
            return -1;
        h->depth_body++;
        return 0;
    case TA_INLINE_WS:
        if (add_ws_if_necessary(h) < 0)
            return -1;
        return 0;
    case TA_INLINE_NO_WS:
        return 0;
    case TA_BLOCK_LABEL:
        for (int i = 0; i < e->nlabels; i++)
            if (ipush(&h->label_stack, &h->label_len, &h->label_cap,
                      e->labels[i]) < 0)
                return -1;
        return 1;
    case TA_VOID:
        return 0;
    default:
        return 1; /* TA_TIME */
    }
}

/* handler.py:274-299 _action_end */
static int action_end(Handler *h, int ta)
{
    switch (ta) {
    case TA_IGNORABLE:
        h->depth_ignoreable--;
        return 1;
    case TA_ANCHOR:
        h->depth_anchor--;
        if (h->depth_anchor == 0 && h->depth_ignoreable == 0) {
            if (add_ws_if_necessary(h) < 0)
                return -1;
            if (buf_push(&h->token_buf, '>') < 0 ||
                buf_push(&h->token_buf, '$') < 0 ||
                buf_push(&h->token_buf, ' ') < 0)
                return -1;
            h->last_was_whitespace = 1;
        }
        return 0;
    case TA_BODY:
        if (flush_block(h) < 0)
            return -1;
        h->depth_body--;
        return 0;
    case TA_INLINE_WS:
        if (add_ws_if_necessary(h) < 0)
            return -1;
        return 0;
    case TA_INLINE_NO_WS:
        return 0;
    case TA_BLOCK_LABEL:
        return 1;
    case TA_VOID:
        return 0;
    default:
        return 1; /* TA_TIME */
    }
}

/* handler.py:199-220 start_element; dt_val = first datetime attr (owned
 * by caller) for <time>, or NULL */
static int start_element(Handler *h, const void *nm_v,
                         const TagEnt *e, PyObject *dt_val)
{
    int atom_id = (e && (e->props & PROP_ATOM)) ? e->atom_id : 0;
    if (ipush(&h->atom_stack, &h->atom_len, &h->atom_cap, atom_id) < 0)
        return -1;

    int ta = e ? e->action : TA_NONE;
    if (ta != TA_NONE) {
        if (ta == TA_TIME && dt_val) {
            if (PyList_Append(h->datetimes, dt_val) < 0)
                return -1;
        }
        if (changes_tag_level(ta))
            h->depth_tag++;
        int f = action_start(h, ta, e);
        if (f < 0)
            return -1;
        h->flush = f || h->flush;
    } else {
        h->depth_tag++;
        h->flush = 1;
    }

    /* tokenizer lower-cases tag names; only the =="title" compare is
     * ever read, so non-ascii / over-long names store a non-match */
    const Name *nm = (const Name *)nm_v;
    if (nm->ascii && nm->len < 32) {
        h->last_start_len = (int)nm->len;
        memcpy(h->last_start_tag, nm->buf, (size_t)nm->len);
    } else {
        h->last_start_len = 0;
    }
    return 0;
}

/* handler.py:222-244 end_element */
static int end_element(Handler *h, const TagEnt *e)
{
    int pa = h->atom_len ? h->atom_stack[--h->atom_len] : 0;
    int cur = (e && (e->props & PROP_ATOM)) ? e->atom_id : 0;
    if (pa != cur)
        return 0; /* malformed HTML, missing closing tag */

    int ta = e ? e->action : TA_NONE;
    if (ta != TA_NONE) {
        int f = action_end(h, ta);
        if (f < 0)
            return -1;
        h->flush = f || h->flush;
    } else {
        h->flush = 1;
    }

    if (ta == TA_NONE || changes_tag_level(ta))
        h->depth_tag--;

    if (h->flush && h->token_buf.len && flush_block(h) < 0)
        return -1;

    /* content_handler.go:151 — unconditional pop */
    if (h->label_len)
        h->label_len--;
    return 0;
}

/* ------------------------------------------------------------------ */
/* Tokenizer + parse loop — htmltok.py + document.parse_to_handler     */
/* ------------------------------------------------------------------ */

typedef struct {
    const u32 *s;
    Py_ssize_t n, i;
    const TagEnt *raw; /* pending raw-text element, or NULL */
    Buf text_tmp;      /* processed text scratch (separate from handler) */
    Buf attr_tmp;      /* newline-converted attr value */
    Buf attr_val;      /* unescaped attr value */
} Parser;

static inline u32 ascii_lower(u32 c)
{
    return (c >= 'A' && c <= 'Z') ? c + 32 : c;
}

static inline int is_ws_char(u32 c) /* _WS = " \n\r\t\f" */
{
    return c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f';
}

static inline int is_ascii_alpha(u32 c)
{
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}

static void name_from(Name *nm, const u32 *s, Py_ssize_t a, Py_ssize_t b)
{
    nm->len = b - a;
    nm->ascii = 1;
    if (nm->len >= 64) {
        nm->ascii = 0;
        return;
    }
    for (Py_ssize_t i = a; i < b; i++) {
        u32 c = s[i];
        if (c > 127) {
            nm->ascii = 0;
            return;
        }
        nm->buf[i - a] = (char)ascii_lower(c);
    }
}

static const TagEnt *name_ent(const Name *nm)
{
    if (!nm->ascii || nm->len == 0 || nm->len > 31)
        return NULL;
    TagEnt *e = tag_slot(nm->buf, (int)nm->len);
    return e->name ? e : NULL;
}

static inline int name_is(const Name *nm, const char *lit, Py_ssize_t n)
{
    return nm->ascii && nm->len == n && memcmp(nm->buf, lit, (size_t)n) == 0;
}

static Py_ssize_t find_char(const u32 *s, Py_ssize_t i, Py_ssize_t n, u32 c)
{
    for (; i < n; i++)
        if (s[i] == c)
            return i;
    return -1;
}

/* htmltok.py:122-134 _read_raw_end_tag */
static Py_ssize_t read_raw_end_tag(Parser *p, Py_ssize_t i)
{
    const u32 *s = p->s;
    const TagEnt *tag = p->raw;
    Py_ssize_t j = i + 2;
    Py_ssize_t end = j + tag->len;
    if (end > p->n)
        return -1;
    for (int t = 0; t < tag->len; t++)
        if ((u32)ascii_lower(s[j + t]) != (u32)(unsigned char)tag->name[t])
            return -1;
    if (end >= p->n)
        return -1; /* EOF right after the name: not an end tag */
    u32 c = s[end];
    if (is_ws_char(c) || c == '/' || c == '>')
        return i;
    return -1;
}

/* htmltok.py:136-148 _read_raw_or_rcdata */
static Py_ssize_t read_raw_or_rcdata(Parser *p)
{
    const u32 *s = p->s;
    Py_ssize_t n = p->n, i = p->i;
    for (;;) {
        Py_ssize_t j;
        for (j = i; j + 1 < n; j++)
            if (s[j] == '<' && s[j + 1] == '/')
                break;
        if (j + 1 >= n)
            return n;
        Py_ssize_t k = read_raw_end_tag(p, j);
        if (k != -1)
            return k;
        i = j + 2;
    }
}

/* htmltok.py:150-259 _read_script (escaped / double-escaped states) */
static Py_ssize_t read_script(Parser *p)
{
    const u32 *s = p->s;
    Py_ssize_t n = p->n, i = p->i;
    int state = 0;
    while (i < n) {
        if (state == 0) {
            Py_ssize_t j = find_char(s, i, n, '<');
            if (j == -1)
                return n;
            u32 c = (j + 1 < n) ? s[j + 1] : 0;
            if (c == '/') {
                Py_ssize_t k = read_raw_end_tag(p, j);
                if (k != -1)
                    return k;
                i = j + 2;
            } else if (c == '!') {
                if (j + 3 < n && s[j + 2] == '-' && s[j + 3] == '-') {
                    state = 1;
                    i = j + 4;
                } else {
                    i = j + 2;
                }
            } else {
                i = j + 1;
            }
        } else if (state == 1) {
            Py_ssize_t j = i;
            int found = 0;
            while (j < n) {
                u32 c = s[j];
                if (c == '-') {
                    Py_ssize_t k = j;
                    while (k < n && s[k] == '-')
                        k++;
                    if (k - j >= 2 && k < n && s[k] == '>') {
                        state = 0;
                        i = k + 1;
                        found = 1;
                        break;
                    }
                    j = k;
                } else if (c == '<') {
                    if (j + 1 < n && s[j + 1] == '/') {
                        Py_ssize_t k = read_raw_end_tag(p, j);
                        if (k != -1)
                            return k;
                        j += 2;
                    } else if (j + 1 < n && is_ascii_alpha(s[j + 1])) {
                        /* "<script" + terminator -> double escape */
                        if (j + 7 < n &&
                            ascii_lower(s[j + 1]) == 's' &&
                            ascii_lower(s[j + 2]) == 'c' &&
                            ascii_lower(s[j + 3]) == 'r' &&
                            ascii_lower(s[j + 4]) == 'i' &&
                            ascii_lower(s[j + 5]) == 'p' &&
                            ascii_lower(s[j + 6]) == 't' &&
                            (is_ws_char(s[j + 7]) || s[j + 7] == '/' ||
                             s[j + 7] == '>')) {
                            state = 2;
                            i = j + 8;
                            found = 1;
                            break;
                        }
                        j += 1;
                    } else {
                        j += 1;
                    }
                } else {
                    j += 1;
                }
            }
            if (!found && j >= n)
                return n;
        } else {
            Py_ssize_t j = i;
            int found = 0;
            while (j < n) {
                u32 c = s[j];
                if (c == '-') {
                    Py_ssize_t k = j;
                    while (k < n && s[k] == '-')
                        k++;
                    if (k - j >= 2 && k < n && s[k] == '>') {
                        state = 0;
                        i = k + 1;
                        found = 1;
                        break;
                    }
                    j = k;
                } else if (c == '<') {
                    if (j + 1 < n && s[j + 1] == '/') {
                        /* "</script" + term -> back to escaped */
                        if (j + 8 < n &&
                            ascii_lower(s[j + 2]) == 's' &&
                            ascii_lower(s[j + 3]) == 'c' &&
                            ascii_lower(s[j + 4]) == 'r' &&
                            ascii_lower(s[j + 5]) == 'i' &&
                            ascii_lower(s[j + 6]) == 'p' &&
                            ascii_lower(s[j + 7]) == 't' &&
                            (is_ws_char(s[j + 8]) || s[j + 8] == '/' ||
                             s[j + 8] == '>')) {
                            state = 1;
                            i = j + 9;
                            found = 1;
                            break;
                        }
                        j += 2;
                    } else {
                        j += 1;
                    }
                } else {
                    j += 1;
                }
            }
            if (!found && j >= n)
                return n;
        }
    }
    return n;
}

/* htmltok.py:375-377 */
static Py_ssize_t read_until_close_angle(Parser *p, Py_ssize_t i)
{
    Py_ssize_t j = find_char(p->s, i, p->n, '>');
    return j == -1 ? p->n : j + 1;
}

/* htmltok.py:379-401 _read_comment (i just past the opening dashes) */
static Py_ssize_t read_comment(Parser *p, Py_ssize_t i)
{
    const u32 *s = p->s;
    Py_ssize_t n = p->n;
    int dash_count = 2;
    while (i < n) {
        u32 c = s[i];
        i++;
        if (c == '-') {
            dash_count++;
        } else if (c == '>') {
            if (dash_count >= 2)
                return i;
            dash_count = 0;
        } else if (c == '!') {
            if (dash_count >= 2) {
                if (i < n && s[i] == '>')
                    return i + 1;
                i++; /* the checked byte was consumed */
            }
            dash_count = 0;
        } else {
            dash_count = 0;
        }
    }
    return n;
}

/* htmltok.py:403-410 _read_markup_declaration (i just past "<!") */
static Py_ssize_t read_markup_declaration(Parser *p, Py_ssize_t i)
{
    const u32 *s = p->s;
    Py_ssize_t n = p->n;
    if (i + 1 < n && s[i] == '-' && s[i + 1] == '-')
        return read_comment(p, i + 2);
    if (i + 7 <= n && ascii_lower(s[i]) == 'd' &&
        ascii_lower(s[i + 1]) == 'o' && ascii_lower(s[i + 2]) == 'c' &&
        ascii_lower(s[i + 3]) == 't' && ascii_lower(s[i + 4]) == 'y' &&
        ascii_lower(s[i + 5]) == 'p' && ascii_lower(s[i + 6]) == 'e')
        return read_until_close_angle(p, i + 7);
    return read_until_close_angle(p, i);
}

static Py_ssize_t skip_ws(Parser *p, Py_ssize_t i)
{
    while (i < p->n && is_ws_char(p->s[i]))
        i++;
    return i;
}

typedef struct {
    int want;    /* 0 none, 1 script(type), 2 time(datetime) */
    int ld_json; /* any type attr == application/ld+json */
    PyObject *dt; /* first datetime attr value (new ref) or NULL */
    int dt_seen;
} AttrCap;

/* convert newlines + attribute-mode unescape into p->attr_val */
static int process_attr_val(Parser *p, const u32 *v, Py_ssize_t vn)
{
    p->attr_tmp.len = 0;
    if (convert_newlines(v, vn, &p->attr_tmp) < 0)
        return -1;
    p->attr_val.len = 0;
    return go_unescape_u32(p->attr_tmp.p, p->attr_tmp.len, 1, &p->attr_val);
}

static const char LDJSON_MIME[] = "application/ld+json";

static int handle_attr(Parser *p, AttrCap *cap, const u32 *k, Py_ssize_t kn,
                       const u32 *v, Py_ssize_t vn)
{
    if (!cap || cap->want == 0 || kn == 0)
        return 0;
    char kb[16];
    if (kn > 15)
        return 0;
    for (Py_ssize_t i = 0; i < kn; i++) {
        if (k[i] > 127)
            return 0;
        kb[i] = (char)ascii_lower(k[i]);
    }
    if (cap->want == 1) {
        if (kn == 4 && memcmp(kb, "type", 4) == 0) {
            if (process_attr_val(p, v, vn) < 0)
                return -1;
            Py_ssize_t m = (Py_ssize_t)sizeof(LDJSON_MIME) - 1;
            if (p->attr_val.len == m) {
                int eq = 1;
                for (Py_ssize_t i = 0; i < m; i++)
                    if (p->attr_val.p[i] != (u32)(unsigned char)LDJSON_MIME[i]) {
                        eq = 0;
                        break;
                    }
                if (eq)
                    cap->ld_json = 1;
            }
        }
    } else if (cap->want == 2) {
        if (kn == 8 && memcmp(kb, "datetime", 8) == 0 && !cap->dt_seen) {
            cap->dt_seen = 1;
            if (process_attr_val(p, v, vn) < 0)
                return -1;
            cap->dt = str_from_u32(p->attr_val.p, p->attr_val.len);
            if (!cap->dt)
                return -1;
        }
    }
    return 0;
}

/* htmltok.py:269-282 _read_tag_name + 307-371 _read_tag slow path.
 * i points at the first name char.  cap == NULL => END tag (no attrs). */
static int read_tag(Parser *p, Py_ssize_t i, Name *nm, Py_ssize_t *end,
                    int *eof, AttrCap *cap)
{
    const u32 *s = p->s;
    Py_ssize_t n = p->n;
    *eof = 0;

    /* read tag name */
    Py_ssize_t a = i, j = i;
    for (;;) {
        if (j >= n) {
            name_from(nm, s, a, j);
            i = j;
            break;
        }
        u32 c = s[j];
        if (is_ws_char(c)) {
            name_from(nm, s, a, j);
            i = j + 1;
            break;
        }
        if (c == '/' || c == '>') {
            name_from(nm, s, a, j);
            i = j;
            break;
        }
        j++;
    }
    if (cap) {
        cap->want = 0;
        cap->ld_json = 0;
        cap->dt = NULL;
        cap->dt_seen = 0;
        if (name_is(nm, "script", 6))
            cap->want = 1;
        else if (name_is(nm, "time", 4))
            cap->want = 2;
    }

    i = skip_ws(p, i);
    for (;;) {
        if (i >= n) {
            *end = i;
            *eof = 1;
            return 0;
        }
        u32 c = s[i];
        if (c == '>') {
            *end = i + 1;
            return 0;
        }
        /* readTagAttrKey */
        Py_ssize_t k0 = i;
        while (i < n) {
            c = s[i];
            if (c == '=' && i == k0) {
                /* leading '=' is part of the name (WHATWG 13.2.5.32) */
                i++;
                continue;
            }
            if (is_ws_char(c) || c == '/' || c == '>' || c == '=')
                break;
            i++;
        }
        Py_ssize_t k1 = i;
        /* readTagAttrVal */
        Py_ssize_t v0 = 0, v1 = 0; /* empty val */
        i = skip_ws(p, i);
        if (i >= n) {
            if (handle_attr(p, cap, s + k0, k1 - k0, s + v0, v1 - v0) < 0)
                return -1;
            *end = i;
            *eof = 1;
            return 0;
        }
        c = s[i];
        if (c == '/') {
            i++;
        } else if (c == '=') {
            i = skip_ws(p, i + 1);
            if (i >= n) {
                if (handle_attr(p, cap, s + k0, k1 - k0, s + v0, v1 - v0) < 0)
                    return -1;
                *end = i;
                *eof = 1;
                return 0;
            }
            u32 q = s[i];
            if (q == '>') {
                /* unconsumed; loop sees it */
            } else if (q == '"' || q == '\'') {
                Py_ssize_t jj = find_char(s, i + 1, n, q);
                if (jj == -1) {
                    v0 = i + 1;
                    v1 = n;
                    i = n;
                } else {
                    v0 = i + 1;
                    v1 = jj;
                    i = jj + 1;
                }
            } else {
                Py_ssize_t jj = i;
                while (jj < n && !is_ws_char(s[jj]) && s[jj] != '>')
                    jj++;
                v0 = i;
                v1 = jj;
                i = (jj < n && s[jj] == '>') ? jj : jj + 1;
                if (i > n)
                    i = n;
            }
        }
        if (handle_attr(p, cap, s + k0, k1 - k0, s + v0, v1 - v0) < 0)
            return -1;
        i = skip_ws(p, i);
    }
}

/* TEXT delivery: ld+json capture (document.py:85-88) then text_token */
static int deliver_text(Parser *p, Handler *h, const u32 *d, Py_ssize_t n)
{
    if (h->in_ld_json) {
        PyObject *t = str_from_u32(d, n);
        if (!t)
            return -1;
        int rc = PyList_Append(h->ld_json, t);
        Py_DECREF(t);
        if (rc < 0)
            return -1;
    }
    return text_token(h, d, n);
}

/* normal text: convert newlines + text-mode unescape into text_tmp */
static int process_text(Parser *p, Py_ssize_t a, Py_ssize_t b)
{
    p->attr_tmp.len = 0;
    if (convert_newlines(p->s + a, b - a, &p->attr_tmp) < 0)
        return -1;
    p->text_tmp.len = 0;
    return go_unescape_u32(p->attr_tmp.p, p->attr_tmp.len, 0, &p->text_tmp);
}

/* the fused iter_tokens + parse_to_handler loop
 * (htmltok.py:414-529 + document.py:74-104) */
static int run_parse(Parser *p, Handler *h)
{
    const u32 *s = p->s;
    Py_ssize_t n = p->n;

    for (;;) {
        Py_ssize_t i = p->i;
        if (i >= n)
            return 0;

        if (p->raw) {
            const TagEnt *tag = p->raw;
            Py_ssize_t end;
            int raw_mode;
            if (tag->len == 9 && memcmp(tag->name, "plaintext", 9) == 0) {
                end = n;
                raw_mode = 1;
            } else if (tag->len == 6 && memcmp(tag->name, "script", 6) == 0) {
                end = read_script(p);
                raw_mode = 1;
            } else {
                end = read_raw_or_rcdata(p);
                raw_mode = !(tag->props & PROP_RCDATA);
            }
            p->raw = NULL;
            if (end > i) {
                p->i = end;
                if (raw_mode) {
                    p->text_tmp.len = 0;
                    if (convert_newlines(s + i, end - i, &p->text_tmp) < 0)
                        return -1;
                    for (Py_ssize_t t = 0; t < p->text_tmp.len; t++)
                        if (p->text_tmp.p[t] == 0)
                            p->text_tmp.p[t] = 0xFFFD;
                } else {
                    if (process_text(p, i, end) < 0)
                        return -1;
                }
                if (deliver_text(p, h, p->text_tmp.p, p->text_tmp.len) < 0)
                    return -1;
                continue;
            }
            /* empty raw text: fall through to normal scanning */
            i = p->i;
        }

        Py_ssize_t text_start = i;
        for (;;) {
            Py_ssize_t j = find_char(s, i, n, '<');
            if (j == -1) {
                p->i = n;
                if (text_start < n) {
                    if (process_text(p, text_start, n) < 0 ||
                        deliver_text(p, h, p->text_tmp.p, p->text_tmp.len) < 0)
                        return -1;
                }
                return 0;
            }
            if (j + 1 >= n) {
                p->i = n;
                if (process_text(p, text_start, n) < 0 ||
                    deliver_text(p, h, p->text_tmp.p, p->text_tmp.len) < 0)
                    return -1;
                return 0;
            }
            u32 c = s[j + 1];
            int tok_start = 0, tok_end = 0, tok_comment = 0;
            if (is_ascii_alpha(c))
                tok_start = 1;
            else if (c == '/')
                tok_end = 1;
            else if (c == '!' || c == '?')
                tok_comment = 1;
            else {
                i = j + 1; /* '<' is part of text */
                continue;
            }

            if (text_start < j) {
                /* emit accumulated text first; re-scan the tag after */
                p->i = j;
                if (process_text(p, text_start, j) < 0 ||
                    deliver_text(p, h, p->text_tmp.p, p->text_tmp.len) < 0)
                    return -1;
                break;
            }

            if (tok_start) {
                Name nm;
                Py_ssize_t end;
                int eof;
                AttrCap cap;
                if (read_tag(p, j + 1, &nm, &end, &eof, &cap) < 0)
                    return -1;
                if (eof) {
                    Py_XDECREF(cap.dt);
                    p->i = n;
                    return 0;
                }
                p->i = end;
                const TagEnt *e = name_ent(&nm);
                if (e && (e->props & PROP_RAW))
                    /* set even when the tag turns out self-closing
                     * (x/net/html readStartTag does the same) */
                    p->raw = e;
                int self_closing = (end - 2 >= 0 && s[end - 2] == '/');
                if (!self_closing) {
                    /* parse loop (document.py:89-98) */
                    if (e && (e->props & PROP_SBSC)) {
                        Py_XDECREF(cap.dt);
                        break; /* skipped start tag */
                    }
                    if (cap.want == 1 && cap.ld_json)
                        h->in_ld_json = 1;
                    int rc = start_element(h, &nm, e, cap.dt);
                    Py_XDECREF(cap.dt);
                    if (rc < 0)
                        return -1;
                } else {
                    Py_XDECREF(cap.dt); /* SELF_CLOSING: do nothing */
                }
                break;
            }

            if (tok_end) {
                if (j + 2 >= n) {
                    p->i = n;
                    if (process_text(p, text_start, n) < 0 ||
                        deliver_text(p, h, p->text_tmp.p,
                                     p->text_tmp.len) < 0)
                        return -1;
                    return 0;
                }
                c = s[j + 2];
                if (c == '>') {
                    p->i = j + 3; /* "</>" empty comment: ignored */
                } else if (is_ascii_alpha(c)) {
                    Name nm;
                    Py_ssize_t end;
                    int eof;
                    if (read_tag(p, j + 2, &nm, &end, &eof, NULL) < 0)
                        return -1;
                    if (eof) {
                        p->i = n;
                        return 0;
                    }
                    p->i = end;
                    if (h->in_ld_json)
                        h->in_ld_json = 0;
                    if (end_element(h, name_ent(&nm)) < 0)
                        return -1;
                } else {
                    p->i = read_until_close_angle(p, j + 2); /* comment */
                }
                break;
            }

            /* comment-ish */
            if (c == '!')
                p->i = read_markup_declaration(p, j + 2);
            else
                p->i = read_until_close_angle(p, j + 2);
            break;
        }
    }
}

/* ------------------------------------------------------------------ */
/* module interface                                                    */
/* ------------------------------------------------------------------ */

static int set_ranges(unsigned char *bits, PyObject *ranges)
{
    /* ranges: sequence of (lo, hi) inclusive */
    PyObject *seq = PySequence_Fast(ranges, "ranges must be a sequence");
    if (!seq)
        return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *pair = PySequence_Fast_GET_ITEM(seq, i);
        long lo = PyLong_AsLong(PyTuple_GET_ITEM(pair, 0));
        long hi = PyLong_AsLong(PyTuple_GET_ITEM(pair, 1));
        if (PyErr_Occurred()) {
            Py_DECREF(seq);
            return -1;
        }
        for (long c = lo; c <= hi && c < CP_MAX; c++)
            bits[c >> 3] |= (unsigned char)(1u << (c & 7));
    }
    Py_DECREF(seq);
    return 0;
}

static int cmp_u32(const void *a, const void *b)
{
    u32 x = *(const u32 *)a, y = *(const u32 *)b;
    return x < y ? -1 : x > y ? 1 : 0;
}

static int mark_names(PyObject *names, int prop, int action)
{
    PyObject *seq = PySequence_Fast(names, "names must be a sequence");
    if (!seq)
        return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *it = PySequence_Fast_GET_ITEM(seq, i);
        Py_ssize_t len;
        const char *name = PyUnicode_AsUTF8AndSize(it, &len);
        if (!name || len > 31) {
            Py_DECREF(seq);
            if (!PyErr_Occurred())
                PyErr_SetString(PyExc_ValueError, "tag name too long");
            return -1;
        }
        int idx = tag_insert(name, len);
        if (idx < 0) {
            Py_DECREF(seq);
            return -1;
        }
        g_tags[idx].props |= prop;
        if (action)
            g_tags[idx].action = action;
        if (prop == PROP_ATOM)
            g_tags[idx].atom_id = ++g_atom_count;
    }
    Py_DECREF(seq);
    return 0;
}

static PyObject *py_init_tables(PyObject *self, PyObject *args)
{
    PyObject *cfg;
    if (!PyArg_ParseTuple(args, "O!", &PyDict_Type, &cfg))
        return NULL;
    if (g_ready) {
        Py_RETURN_NONE; /* idempotent */
    }

    if (!g_word_bits) {
        g_word_bits = (unsigned char *)PyMem_Calloc(CP_MAX / 8 + 1, 1);
        g_tokw_bits = (unsigned char *)PyMem_Calloc(CP_MAX / 8 + 1, 1);
        if (!g_word_bits || !g_tokw_bits)
            return PyErr_NoMemory();
    }

    PyObject *letters = PyDict_GetItemString(cfg, "letter_ranges");
    PyObject *numeric = PyDict_GetItemString(cfg, "numeric_word_ranges");
    PyObject *entities = PyDict_GetItemString(cfg, "entities");
    PyObject *go_space = PyDict_GetItemString(cfg, "go_space");
    PyObject *actions = PyDict_GetItemString(cfg, "tag_actions");
    PyObject *atoms = PyDict_GetItemString(cfg, "atoms");
    PyObject *raw_tags = PyDict_GetItemString(cfg, "raw_tags");
    PyObject *rcdata = PyDict_GetItemString(cfg, "rcdata_tags");
    PyObject *sbsc = PyDict_GetItemString(cfg, "sbsc_tags");
    PyObject *labels = PyDict_GetItemString(cfg, "block_labels");
    if (!letters || !numeric || !entities || !go_space || !actions ||
        !atoms || !raw_tags || !rcdata || !sbsc || !labels) {
        PyErr_SetString(PyExc_KeyError, "init_tables: missing config key");
        return NULL;
    }

    /* word char = \p{L} + \p{Nd}\p{Nl}\p{No}; tokenize word = \p{L}+0-9+_ */
    if (set_ranges(g_word_bits, letters) < 0 ||
        set_ranges(g_word_bits, numeric) < 0 ||
        set_ranges(g_tokw_bits, letters) < 0)
        return NULL;
    for (u32 c = '0'; c <= '9'; c++)
        g_tokw_bits[c >> 3] |= (unsigned char)(1u << (c & 7));
    g_tokw_bits['_' >> 3] |= (unsigned char)(1u << ('_' & 7));

    /* GO_SPACE codepoints (sorted) */
    Py_ssize_t gn = PyUnicode_GET_LENGTH(go_space);
    if (gn > 64) {
        PyErr_SetString(PyExc_ValueError, "go_space too large");
        return NULL;
    }
    g_nspace = (int)gn;
    for (Py_ssize_t i = 0; i < gn; i++)
        g_space[i] = (u32)PyUnicode_READ_CHAR(go_space, i);
    qsort(g_space, (size_t)g_nspace, sizeof(u32), cmp_u32);

    Py_INCREF(entities);
    g_entities = entities;

    /* atoms FIRST so atom_id assignment covers every interned name */
    if (mark_names(atoms, PROP_ATOM, 0) < 0 ||
        mark_names(raw_tags, PROP_RAW, 0) < 0 ||
        mark_names(rcdata, PROP_RCDATA, 0) < 0 ||
        mark_names(sbsc, PROP_SBSC, 0) < 0)
        return NULL;

    /* tag actions: {name: action_int} */
    PyObject *k, *v;
    Py_ssize_t pos = 0;
    while (PyDict_Next(actions, &pos, &k, &v)) {
        Py_ssize_t len;
        const char *name = PyUnicode_AsUTF8AndSize(k, &len);
        long act = PyLong_AsLong(v);
        if (!name || PyErr_Occurred())
            return NULL;
        int idx = tag_insert(name, len);
        if (idx < 0)
            return NULL;
        g_tags[idx].action = (int)act;
    }

    /* block labels: {name: (label_int, ...)} max 2 */
    pos = 0;
    while (PyDict_Next(labels, &pos, &k, &v)) {
        Py_ssize_t len;
        const char *name = PyUnicode_AsUTF8AndSize(k, &len);
        if (!name)
            return NULL;
        int idx = tag_insert(name, len);
        if (idx < 0)
            return NULL;
        Py_ssize_t nl = PyTuple_GET_SIZE(v);
        if (nl > 2) {
            PyErr_SetString(PyExc_ValueError, "too many block labels");
            return NULL;
        }
        for (Py_ssize_t t = 0; t < nl; t++) {
            long lv = PyLong_AsLong(PyTuple_GET_ITEM(v, t));
            if (PyErr_Occurred())
                return NULL;
            g_tags[idx].labels[t] = (int)lv;
        }
        g_tags[idx].nlabels = (int)nl;
    }

    g_ready = 1;
    Py_RETURN_NONE;
}

static void parser_free(Parser *p)
{
    buf_free(&p->text_tmp);
    buf_free(&p->attr_tmp);
    buf_free(&p->attr_val);
}

static PyObject *py_parse(PyObject *self, PyObject *args)
{
    PyObject *html;
    if (!PyArg_ParseTuple(args, "U", &html))
        return NULL;
    if (!g_ready) {
        PyErr_SetString(PyExc_RuntimeError, "init_tables() not called");
        return NULL;
    }

    Py_ssize_t n = PyUnicode_GET_LENGTH(html);
    Py_UCS4 *buf = PyUnicode_AsUCS4Copy(html);
    if (!buf)
        return NULL;

    Parser p;
    memset(&p, 0, sizeof(p));
    p.s = (const u32 *)buf;
    p.n = n;

    Handler h;
    if (h_init(&h) < 0) {
        h_free(&h);
        PyMem_Free(buf);
        return NULL;
    }

    int rc = run_parse(&p, &h);
    /* parse_document calls h.flush_block() once after the loop */
    if (rc == 0)
        rc = flush_block(&h);

    PyObject *result = NULL;
    if (rc == 0) {
        PyObject *title = h.title ? h.title : PyUnicode_New(0, 0);
        if (h.title)
            Py_INCREF(h.title);
        result = Py_BuildValue("(NOOO)", title, h.blocks, h.ld_json,
                               h.datetimes);
    }
    h_free(&h);
    parser_free(&p);
    PyMem_Free(buf);
    return result;
}

static PyObject *py_unescape(PyObject *self, PyObject *args)
{
    PyObject *txt;
    int attribute = 0;
    if (!PyArg_ParseTuple(args, "U|p", &txt, &attribute))
        return NULL;
    if (!g_ready) {
        PyErr_SetString(PyExc_RuntimeError, "init_tables() not called");
        return NULL;
    }
    Py_ssize_t n = PyUnicode_GET_LENGTH(txt);
    Py_UCS4 *buf = PyUnicode_AsUCS4Copy(txt);
    if (!buf)
        return NULL;
    Buf out = {0};
    PyObject *res = NULL;
    if (go_unescape_u32((const u32 *)buf, n, attribute, &out) == 0)
        res = str_from_u32(out.p, out.len);
    buf_free(&out);
    PyMem_Free(buf);
    return res;
}

static PyMethodDef ckernel_methods[] = {
    {"init_tables", py_init_tables, METH_VARARGS,
     "Install the shared kernel tables (idempotent)."},
    {"parse", py_parse, METH_VARARGS,
     "parse(html) -> (title, blocks, ld_json, datetimes)"},
    {"unescape", py_unescape, METH_VARARGS,
     "unescape(s, attribute=False) -> str (escape.go semantics)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef ckernel_module = {
    PyModuleDef_HEAD_INIT, "_ckernel",
    "Compiled boilerpipe kernel hot path (see module docstring in the .c).",
    -1, ckernel_methods,
};

PyMODINIT_FUNC PyInit__ckernel(void)
{
    return PyModule_Create(&ckernel_module);
}
