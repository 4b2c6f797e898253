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
/* TextBlock — textblock.py port (C-side blocks so the filter chain    */
/* can run without crossing the C/Python boundary per block)           */
/* ------------------------------------------------------------------ */

/* label enum values (textblock.py:15-23): 0..8; label_map becomes a
 * fixed count array (filters only use membership and merged counts —
 * dict insertion order is never observable in the pipeline) */
#define N_LABELS 9
#define LBL_INDICATES_END_OF_TEXT 0
#define LBL_MIGHT_BE_CONTENT 1
#define LBL_VERY_LIKELY_CONTENT 2
#define LBL_TITLE 3
#define LBL_LIST 4
#define LBL_HEADING 5

typedef struct {
    u32 *text;
    Py_ssize_t text_len;
    long num_words, num_linked_words, nwiwl, nwl;
    long off_start, off_end;
    int tag_level;
    int is_content;
    long labels[N_LABELS];
} CBlock;

static void cblock_free(CBlock *b)
{
    if (b) {
        PyMem_Free(b->text);
        PyMem_Free(b);
    }
}

/* textblock.py:73-87 merge_next */
static int cblock_merge_next(CBlock *a, CBlock *b)
{
    u32 *nt = (u32 *)PyMem_Malloc(
        (size_t)(a->text_len + 1 + b->text_len) * sizeof(u32));
    if (!nt) {
        PyErr_NoMemory();
        return -1;
    }
    memcpy(nt, a->text, (size_t)a->text_len * sizeof(u32));
    nt[a->text_len] = '\n';
    memcpy(nt + a->text_len + 1, b->text,
           (size_t)b->text_len * sizeof(u32));
    PyMem_Free(a->text);
    a->text = nt;
    a->text_len = a->text_len + 1 + b->text_len;
    if (b->off_start < a->off_start)
        a->off_start = b->off_start;
    if (b->off_end > a->off_end)
        a->off_end = b->off_end;
    a->num_words += b->num_words;
    a->num_linked_words += b->num_linked_words;
    a->nwiwl += b->nwiwl;
    a->nwl += b->nwl;
    a->is_content = a->is_content || b->is_content;
    for (int i = 0; i < N_LABELS; i++)
        a->labels[i] += b->labels[i];
    if (b->tag_level < a->tag_level)
        a->tag_level = b->tag_level;
    return 0;
}

static inline double cb_link_density(const CBlock *b)
{
    if (b->num_words == 0)
        return 0.0;
    return (double)b->num_linked_words / (double)b->num_words;
}

/* ------------------------------------------------------------------ */
/* ContentHandler — handler.py port                                    */
/* ------------------------------------------------------------------ */

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
    CBlock **blocks;
    Py_ssize_t nblocks, cap_blocks;
    PyObject *ld_json;   /* list of str */
    PyObject *datetimes; /* list of str */
    PyObject *title;     /* str or NULL */
    int in_ld_json;
} Handler;

static int h_init(Handler *h)
{
    memset(h, 0, sizeof(*h));
    h->depth_block_tag = -1;
    h->ld_json = PyList_New(0);
    h->datetimes = PyList_New(0);
    if (!h->ld_json || !h->datetimes)
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
    for (Py_ssize_t i = 0; i < h->nblocks; i++)
        cblock_free(h->blocks[i]);
    PyMem_Free(h->blocks);
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
        CBlock *cb = (CBlock *)PyMem_Calloc(1, sizeof(CBlock));
        if (!cb) {
            PyErr_NoMemory();
            return -1;
        }
        cb->text_len = xb - xa;
        cb->text = (u32 *)PyMem_Malloc(
            (size_t)(cb->text_len ? cb->text_len : 1) * sizeof(u32));
        if (!cb->text) {
            PyMem_Free(cb);
            PyErr_NoMemory();
            return -1;
        }
        memcpy(cb->text, h->text_buf.p + xa,
               (size_t)cb->text_len * sizeof(u32));
        cb->num_words = num_words;
        cb->num_linked_words = num_linked_words;
        cb->nwiwl = num_words_in_wrapped_lines;
        cb->nwl = num_wrapped_lines;
        cb->off_start = h->offset_blocks;
        cb->off_end = h->offset_blocks;
        cb->tag_level = h->depth_block_tag;
        /* labelStack.PopAll(): counts only — order is unobservable */
        for (Py_ssize_t t = 0; t < h->label_len; t++) {
            int lv = h->label_stack[t];
            if (lv >= 0 && lv < N_LABELS)
                cb->labels[lv]++;
        }
        h->label_len = 0;
        if (h->nblocks >= h->cap_blocks) {
            Py_ssize_t nc = h->cap_blocks ? h->cap_blocks * 2 : 64;
            CBlock **np = (CBlock **)PyMem_Realloc(
                h->blocks, (size_t)nc * sizeof(CBlock *));
            if (!np) {
                cblock_free(cb);
                PyErr_NoMemory();
                return -1;
            }
            h->blocks = np;
            h->cap_blocks = nc;
        }
        h->blocks[h->nblocks++] = cb;
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
/* Article filter chain — filters.py port (filter.go semantics)        */
/* ------------------------------------------------------------------ */

/* Go strings.ToLower = the SIMPLE per-rune lowercase mapping, which is
 * exactly what Py_UNICODE_TOLOWER provides (Python str.lower() differs
 * only by the U+0130 expansion and Final_Sigma — the two cases
 * filters.py pre-translates; see its _GO_LOWER_FIX comment). */
static inline u32 go_lower_rune(u32 c)
{
    if (c < 0x80)
        return (c >= 'A' && c <= 'Z') ? c + 32 : c;
    if (c == 0x130)
        return 'i'; /* Go simple map for İ (filters.py _GO_LOWER_FIX) */
    if (c == 0x3A3)
        return 0x3C3; /* Σ -> σ always (no Final_Sigma context) */
    return (u32)Py_UNICODE_TOLOWER((Py_UCS4)c);
}

static int u32_startswith_ascii(const u32 *s, Py_ssize_t n, const char *lit)
{
    Py_ssize_t m = (Py_ssize_t)strlen(lit);
    if (n < m)
        return 0;
    for (Py_ssize_t i = 0; i < m; i++)
        if (s[i] != (u32)(unsigned char)lit[i])
            return 0;
    return 1;
}

/* needle given as UCS4 array */
static int u32_contains(const u32 *s, Py_ssize_t n, const u32 *nd,
                        Py_ssize_t m)
{
    if (m == 0)
        return 1;
    for (Py_ssize_t i = 0; i + m <= n; i++) {
        if (s[i] == nd[0] && memcmp(s + i, nd, (size_t)m * sizeof(u32)) == 0)
            return 1;
    }
    return 0;
}

static Py_ssize_t u32_find(const u32 *s, Py_ssize_t n, const u32 *nd,
                           Py_ssize_t m)
{
    if (m == 0)
        return 0;
    for (Py_ssize_t i = 0; i + m <= n; i++)
        if (s[i] == nd[0] && memcmp(s + i, nd, (size_t)m * sizeof(u32)) == 0)
            return i;
    return -1;
}

static int u32_eq_ascii(const u32 *s, Py_ssize_t n, const char *lit)
{
    Py_ssize_t m = (Py_ssize_t)strlen(lit);
    if (n != m)
        return 0;
    for (Py_ssize_t i = 0; i < m; i++)
        if (s[i] != (u32)(unsigned char)lit[i])
            return 0;
    return 1;
}

/* filters.py:48-58 _starts_with_number */
static int starts_with_number(const u32 *s, Py_ssize_t n)
{
    Py_ssize_t i = 0;
    while (i < n && s[i] >= '0' && s[i] <= '9')
        i++;
    if (i == 0)
        return 0;
    if (u32_startswith_ascii(s + i, n - i, " comments"))
        return 1;
    if (u32_startswith_ascii(s + i, n - i, " users responded in"))
        return 1;
    return 0;
}

/* the two non-ASCII phrases, as UCS4 literals */
static const u32 PH_REUTERS[] = {0xA9, ' ', 'r', 'e', 'u', 't', 'e', 'r', 's'};
static const u32 PH_RATTA[] = {'r', 0xE4, 't', 't', 'a', ' ', 'a', 'r', 't',
                               'i', 'k', 'e', 'l', 'n'};
static const char *TERM_CONTAINS_ASCII[] = {
    "what you think...", "add your comment", "add comment", "reader views",
    "have your say", "reader comments", NULL,
};

static int u32_contains_ascii(const u32 *s, Py_ssize_t n, const char *lit)
{
    Py_ssize_t m = (Py_ssize_t)strlen(lit);
    for (Py_ssize_t i = 0; i + m <= n; i++) {
        Py_ssize_t t = 0;
        while (t < m && s[i + t] == (u32)(unsigned char)lit[t])
            t++;
        if (t == m)
            return 1;
    }
    return 0;
}

/* filters.py:61-90 F1 terminating_blocks.  scratch reused for lowering. */
static int f_terminating_blocks(Handler *h)
{
    for (Py_ssize_t bi = 0; bi < h->nblocks; bi++) {
        CBlock *tb = h->blocks[bi];
        if (tb->num_words >= 15)
            continue;
        Py_ssize_t a = 0, b = tb->text_len;
        trim_go_space(tb->text, &a, &b);
        const u32 *tx = tb->text + a;
        Py_ssize_t tn = b - a;
        if (utf8_byte_len(tx, tn) >= 8) {
            Buf *sc = &h->scratch;
            sc->len = 0;
            if (buf_reserve(sc, tn) < 0)
                return -1;
            for (Py_ssize_t i = 0; i < tn; i++)
                sc->p[sc->len++] = go_lower_rune(tx[i]);
            const u32 *lc = sc->p;
            Py_ssize_t ln = sc->len;
            int hit =
                u32_startswith_ascii(lc, ln, "comments") ||
                starts_with_number(lc, ln) ||
                (ln >= 9 && memcmp(lc, PH_REUTERS, sizeof(PH_REUTERS)) == 0) ||
                u32_startswith_ascii(lc, ln, "please rate this") ||
                u32_startswith_ascii(lc, ln, "post a comment");
            if (!hit) {
                for (int t = 0; TERM_CONTAINS_ASCII[t]; t++)
                    if (u32_contains_ascii(lc, ln, TERM_CONTAINS_ASCII[t])) {
                        hit = 1;
                        break;
                    }
                if (!hit &&
                    u32_contains(lc, ln, PH_RATTA,
                                 (Py_ssize_t)(sizeof(PH_RATTA) / 4)))
                    hit = 1;
                if (!hit &&
                    u32_eq_ascii(lc, ln,
                                 "thanks for your comments - this feedback "
                                 "is now closed"))
                    hit = 1;
            }
            if (hit)
                tb->labels[LBL_INDICATES_END_OF_TEXT]++;
        } else if (cb_link_density(tb) == 1.0) {
            if (u32_eq_ascii(tx, tn, "Comment"))
                tb->labels[LBL_INDICATES_END_OF_TEXT]++;
        }
    }
    return 0;
}

/* -- F2 DocumentTitleMatchClassifier ------------------------------------ */

/* filters.py:169-174 _normalize_title_text into an owned buffer */
static int normalize_title(const u32 *s, Py_ssize_t n, Buf *out)
{
    out->len = 0;
    if (buf_reserve(out, n) < 0)
        return -1;
    for (Py_ssize_t i = 0; i < n; i++) {
        u32 c = s[i];
        if (c == 0xA0)
            c = ' ';
        else if (c == '\'')
            continue;
        out->p[out->len++] = c;
    }
    Py_ssize_t a = 0, b = out->len;
    trim_go_space(out->p, &a, &b);
    for (Py_ssize_t i = a; i < b; i++)
        out->p[i - a] = go_lower_rune(out->p[i]);
    out->len = b - a;
    return 0;
}

/* the six separator char classes (filters.py:95-105); space membership
 * only in the last one */
static const char *SEP_SETS[6] = {
    "|\xc2\xbb-",          /* [\|»|-]   (duplicate | collapses) */
    "|\xc2\xbb:",
    "|\xc2\xbb:()",
    "|\xc2\xbb:()-",
    "|\xc2\xbb,:()-",
    "|\xc2\xbb,:()- ",
};

static int sep_in_set(u32 c, int set_idx)
{
    /* sets contain ASCII chars + U+00BB (») */
    if (c == 0xBB)
        return 1;
    if (c > 127)
        return 0;
    const char *p = SEP_SETS[set_idx];
    while (*p) {
        if ((unsigned char)*p == 0xC2) {
            p += 2; /* skip the utf-8 » */
            continue;
        }
        if ((u32)(unsigned char)*p == c)
            return 1;
        p++;
    }
    return 0;
}

/* leftmost-greedy match of "[ ]*[set][ ]*" in s[p0..n) */
static int sep_match(const u32 *s, Py_ssize_t n, Py_ssize_t p0, int set_idx,
                     int set_has_space, Py_ssize_t *ms, Py_ssize_t *me)
{
    for (Py_ssize_t pp = p0; pp < n; pp++) {
        Py_ssize_t k = pp;
        while (k < n && s[k] == ' ')
            k++;
        Py_ssize_t j = -1;
        if (k < n && sep_in_set(s[k], set_idx))
            j = k; /* greedy: maximal spaces, then the set char */
        else if (set_has_space && k > pp)
            j = k - 1; /* the set char is the run's last space */
        if (j >= 0) {
            Py_ssize_t e = j + 1;
            while (e < n && s[e] == ' ')
                e++;
            *ms = pp;
            *me = e;
            return 1;
        }
        /* no match starting at pp; leftmost scan advances one char */
    }
    return 0;
}

/* count of re.split("[\x08 ]+") parts = separator runs + 1 */
static long word_split_count(const u32 *s, Py_ssize_t n)
{
    long runs = 0;
    Py_ssize_t i = 0;
    while (i < n) {
        if (s[i] == ' ' || s[i] == 0x08) {
            runs++;
            while (i < n && (s[i] == ' ' || s[i] == 0x08))
                i++;
        } else {
            i++;
        }
    }
    return runs + 1;
}

static const u32 DOTCOM[] = {'.', 'c', 'o', 'm'};

/* potential-title set: owned UCS4 strings */
typedef struct {
    u32 *p[64];
    Py_ssize_t len[64];
    int n;
} TitleSet;

static int tset_add(TitleSet *ts, const u32 *s, Py_ssize_t n)
{
    for (int i = 0; i < ts->n; i++)
        if (ts->len[i] == n &&
            memcmp(ts->p[i], s, (size_t)n * sizeof(u32)) == 0)
            return 0; /* already present (set semantics) */
    if (ts->n >= 64)
        return 0; /* far above any real potential-set size */
    u32 *cp = (u32 *)PyMem_Malloc((size_t)(n ? n : 1) * sizeof(u32));
    if (!cp) {
        PyErr_NoMemory();
        return -1;
    }
    memcpy(cp, s, (size_t)n * sizeof(u32));
    ts->p[ts->n] = cp;
    ts->len[ts->n] = n;
    ts->n++;
    return 0;
}

static void tset_free(TitleSet *ts)
{
    for (int i = 0; i < ts->n; i++)
        PyMem_Free(ts->p[i]);
    ts->n = 0;
}

static int tset_has(const TitleSet *ts, const u32 *s, Py_ssize_t n)
{
    for (int i = 0; i < ts->n; i++)
        if (ts->len[i] == n &&
            memcmp(ts->p[i], s, (size_t)n * sizeof(u32)) == 0)
            return 1;
    return 0;
}

/* filters.py:113-128 _get_longest_part for one separator pattern */
static int get_longest_part(const u32 *t, Py_ssize_t n, int set_idx,
                            TitleSet *ts)
{
    int set_has_space = (set_idx == 5);
    Py_ssize_t pos = 0, ms, me;
    /* first check there is at least one separator (len(parts)==1 -> "") */
    if (!sep_match(t, n, 0, set_idx, set_has_space, &ms, &me))
        return 0;
    long longest_num_words = 0;
    const u32 *lp = NULL;
    Py_ssize_t lplen = 0;
    pos = 0;
    for (;;) {
        Py_ssize_t ps, pe;
        int more = sep_match(t, n, pos, set_idx, set_has_space, &ms, &me);
        ps = pos;
        pe = more ? ms : n;
        /* part = t[ps..pe) */
        if (!u32_contains(t + ps, pe - ps, DOTCOM, 4)) {
            long nwords = word_split_count(t + ps, pe - ps);
            if (nwords > longest_num_words || (pe - ps) > lplen) {
                longest_num_words = nwords;
                lp = t + ps;
                lplen = pe - ps;
            }
        }
        if (!more)
            break;
        pos = me;
    }
    if (lp == NULL || lplen == 0)
        return 0;
    Py_ssize_t a = 0, b = lplen;
    trim_go_space(lp, &a, &b);
    if (b <= a)
        return tset_add(ts, lp, 0);
    return tset_add(ts, lp + a, b - a);
}

/* filters.py:131-141 _add_potential_titles (single-space split parts) */
static int add_potential_titles(const u32 *t, Py_ssize_t n, TitleSet *ts)
{
    /* parts = title.split(" "); if only one part, nothing */
    int has_space = 0;
    for (Py_ssize_t i = 0; i < n; i++)
        if (t[i] == ' ') {
            has_space = 1;
            break;
        }
    if (!has_space)
        return 0;
    Py_ssize_t i = 0;
    while (i <= n) {
        Py_ssize_t j = i;
        while (j < n && t[j] != ' ')
            j++;
        if (!u32_contains(t + i, j - i, DOTCOM, 4) &&
            word_split_count(t + i, j - i) >= 4) {
            if (tset_add(ts, t + i, j - i) < 0)
                return -1;
        }
        i = j + 1;
        if (j >= n)
            break;
    }
    return 0;
}

/* filters.py:144-148 _remove_first for " - [^-]+$" and "^[^-]+ - " */
static int remove_first_trail(const u32 *t, Py_ssize_t n, TitleSet *ts)
{
    /* leftmost p with t[p..p+3)==" - " and t[p+3..n) nonempty, no '-' */
    Py_ssize_t p = -1;
    for (Py_ssize_t i = 0; i + 3 < n + 1; i++) {
        if (t[i] == ' ' && i + 2 < n && t[i + 1] == '-' && t[i + 2] == ' ') {
            if (i + 3 >= n)
                continue; /* [^-]+ needs >=1 char */
            int ok = 1;
            for (Py_ssize_t j = i + 3; j < n; j++)
                if (t[j] == '-') {
                    ok = 0;
                    break;
                }
            if (ok) {
                p = i;
                break;
            }
        }
    }
    if (p < 0)
        return tset_add(ts, t, n);
    /* matched text = t[p..n); remove its FIRST occurrence in t */
    Py_ssize_t at = u32_find(t, n, t + p, n - p);
    Buf tmp = {0};
    if (buf_extend(&tmp, t, at) < 0 ||
        buf_extend(&tmp, t + at + (n - p), n - (at + (n - p))) < 0) {
        buf_free(&tmp);
        return -1;
    }
    int rc = tset_add(ts, tmp.p, tmp.len);
    buf_free(&tmp);
    return rc;
}

static int remove_first_lead(const u32 *t, Py_ssize_t n, TitleSet *ts)
{
    /* "^[^-]+ - ": first '-' at z; need z>=2, t[z-1]==' ', t[z+1]==' ' */
    Py_ssize_t z = -1;
    for (Py_ssize_t i = 0; i < n; i++)
        if (t[i] == '-') {
            z = i;
            break;
        }
    if (z < 2 || z + 1 >= n || t[z - 1] != ' ' || t[z + 1] != ' ')
        return tset_add(ts, t, n);
    /* matched text = t[0..z+2); first occurrence is the prefix */
    return tset_add(ts, t + z + 2, n - (z + 2));
}

/* filters.py:177-202 F2 document_title_match_classifier */
static int f_title_match(Handler *h, const u32 *title0, Py_ssize_t tn0)
{
    if (tn0 == 0)
        return 0;
    Buf title = {0};
    if (normalize_title(title0, tn0, &title) < 0)
        return -1;
    if (title.len == 0) {
        buf_free(&title);
        return 0;
    }
    TitleSet ts = {{0}, {0}, 0};
    int rc = -1;
    if (tset_add(&ts, title.p, title.len) < 0)
        goto done;
    for (int si = 0; si < 6; si++)
        if (get_longest_part(title.p, title.len, si, &ts) < 0)
            goto done;
    if (add_potential_titles(title.p, title.len, &ts) < 0)
        goto done;
    if (remove_first_trail(title.p, title.len, &ts) < 0)
        goto done;
    if (remove_first_lead(title.p, title.len, &ts) < 0)
        goto done;

    for (Py_ssize_t bi = 0; bi < h->nblocks; bi++) {
        CBlock *tb = h->blocks[bi];
        Buf nb = {0};
        if (normalize_title(tb->text, tb->text_len, &nb) < 0)
            goto done;
        if (tset_has(&ts, nb.p, nb.len)) {
            tb->labels[LBL_TITLE]++;
            buf_free(&nb);
            rc = 0;
            goto done;
        }
        /* strip the title punctuation class, then trim */
        Buf pb = {0};
        if (buf_reserve(&pb, nb.len) < 0) {
            buf_free(&nb);
            goto done;
        }
        for (Py_ssize_t i = 0; i < nb.len; i++) {
            u32 c = nb.p[i];
            if (c == '?' || c == '!' || c == '.' || c == '-' || c == ':')
                continue;
            pb.p[pb.len++] = c;
        }
        Py_ssize_t a = 0, b = pb.len;
        trim_go_space(pb.p, &a, &b);
        if (tset_has(&ts, pb.p + a, b - a)) {
            tb->labels[LBL_TITLE]++;
            buf_free(&pb);
            buf_free(&nb);
            rc = 0;
            goto done;
        }
        buf_free(&pb);
        buf_free(&nb);
    }
    rc = 0;
done:
    tset_free(&ts);
    buf_free(&title);
    return rc;
}

/* filters.py:207-243 F3 num_words_rules_classifier */
static void classify3(const CBlock *prev, CBlock *curr, const CBlock *nxt)
{
    int is_content;
    if (cb_link_density(curr) <= 0.333333) {
        if (cb_link_density(prev) <= 0.555556) {
            if (curr->num_words <= 16) {
                if (nxt->num_words <= 15)
                    is_content = prev->num_words > 4;
                else
                    is_content = 1;
            } else {
                is_content = 1;
            }
        } else {
            if (curr->num_words <= 40)
                is_content = nxt->num_words > 17;
            else
                is_content = 1;
        }
    } else {
        is_content = 0;
    }
    curr->is_content = is_content;
}

static const CBlock CB_EMPTY = {0};

static void f_num_words_rules(Handler *h)
{
    Py_ssize_t n = h->nblocks;
    if (n == 0)
        return;
    const CBlock *prev = &CB_EMPTY;
    CBlock *curr = h->blocks[0];
    CBlock *nxt = (n >= 2) ? h->blocks[1] : (CBlock *)&CB_EMPTY;
    classify3(prev, curr, nxt);
    if (n >= 2) {
        for (Py_ssize_t i = 2; i < n; i++) {
            prev = curr;
            curr = nxt;
            nxt = h->blocks[i];
            classify3(prev, curr, nxt);
        }
        prev = curr;
        curr = nxt;
        classify3(prev, curr, &CB_EMPTY);
    }
}

/* filters.py:248-268 F4 ignore_blocks_after_content (min words 60) */
static void f_ignore_after_content(Handler *h)
{
    long num_words = 0;
    int found_end = 0;
    for (Py_ssize_t i = 0; i < h->nblocks; i++) {
        CBlock *tb = h->blocks[i];
        int eot = tb->labels[LBL_INDICATES_END_OF_TEXT] > 0;
        if (tb->is_content) {
            double td = (double)tb->nwiwl / (double)tb->nwl;
            if (td >= 9.0)
                num_words += tb->num_words;
        }
        if (eot && num_words >= 60)
            found_end = 1;
        if (found_end)
            tb->is_content = 0;
    }
}

/* filters.py:273-282 F5 trailing_headline_to_boilerplate */
static void f_trailing_headline(Handler *h)
{
    for (Py_ssize_t i = h->nblocks - 1; i >= 0; i--) {
        CBlock *tb = h->blocks[i];
        if (tb->is_content) {
            if (tb->labels[LBL_HEADING] > 0)
                tb->is_content = 0;
            else
                break;
        }
    }
}

/* filters.py:287-332 F6/F8 block_proximity_fusion */
static int f_block_proximity_fusion(Handler *h, long max_dist,
                                    int content_only, int same_level_only)
{
    if (h->nblocks < 2)
        return 0;
    CBlock *prev_block = NULL;
    Py_ssize_t start_block = 0;
    if (content_only) {
        for (Py_ssize_t i = 0; i < h->nblocks; i++) {
            start_block++;
            if (h->blocks[i]->is_content) {
                prev_block = h->blocks[i];
                break;
            }
        }
        if (prev_block == NULL)
            return 0;
    } else {
        prev_block = h->blocks[0];
        start_block = 1;
    }

    Py_ssize_t i = start_block;
    while (i < h->nblocks) {
        CBlock *tb = h->blocks[i];
        if (!tb->is_content) {
            prev_block = tb;
            i++;
            continue;
        }
        /* Go-port quirk: the current block's own offsets (filter.go:362) */
        long diff = tb->off_start - tb->off_end - 1;
        if (diff <= max_dist) {
            int merge = 1;
            if (content_only && (!prev_block->is_content || !tb->is_content))
                merge = 0;
            if (merge && same_level_only &&
                prev_block->tag_level != tb->tag_level)
                merge = 0;
            if (merge) {
                if (cblock_merge_next(prev_block, tb) < 0)
                    return -1;
                cblock_free(tb);
                memmove(h->blocks + i, h->blocks + i + 1,
                        (size_t)(h->nblocks - i - 1) * sizeof(CBlock *));
                h->nblocks--;
                continue;
            }
            prev_block = tb;
        } else {
            prev_block = tb;
        }
        i++;
    }
    return 0;
}

/* filters.py:337-343 F7 boilerplate_block */
static void f_boilerplate_block(Handler *h)
{
    Py_ssize_t w = 0;
    for (Py_ssize_t i = 0; i < h->nblocks; i++) {
        CBlock *tb = h->blocks[i];
        if (tb->is_content || tb->labels[LBL_TITLE] > 0)
            h->blocks[w++] = tb;
        else
            cblock_free(tb);
    }
    h->nblocks = w;
}

/* filters.py:351-403 F9 keep_largest_blocks (expand + min_words 150) */
static void f_keep_largest_blocks(Handler *h)
{
    if (h->nblocks < 2)
        return;
    long max_num_words = -1;
    CBlock *largest = NULL;
    int level = -1;
    Py_ssize_t n_idx = -1;
    for (Py_ssize_t j = 0; j < h->nblocks; j++) {
        CBlock *tb = h->blocks[j];
        if (tb->is_content && tb->num_words > max_num_words) {
            largest = tb;
            max_num_words = tb->num_words;
            n_idx = j;
            level = tb->tag_level;
        }
    }
    for (Py_ssize_t j = 0; j < h->nblocks; j++) {
        CBlock *tb = h->blocks[j];
        if (tb == largest) {
            tb->is_content = 1;
            tb->labels[LBL_VERY_LIKELY_CONTENT]++;
        } else {
            int isl;
            if (max_num_words >= 1000)
                isl = tb->is_content &&
                      tb->num_words >= (long)(0.25 * (double)max_num_words);
            else if (max_num_words >= 500)
                isl = tb->is_content &&
                      tb->num_words >= (long)(0.6 * (double)max_num_words);
            else
                isl = tb->is_content && tb->num_words == max_num_words;
            tb->is_content = isl;
            tb->labels[LBL_MIGHT_BE_CONTENT]++;
        }
    }
    if (n_idx != -1) {
        for (Py_ssize_t j = h->nblocks - 1; j >= 0; j--) {
            CBlock *tb = h->blocks[j];
            if (tb->tag_level < level)
                break;
            if (tb->tag_level == level && tb->num_words >= 150)
                tb->is_content = 1;
        }
        for (Py_ssize_t j = 0; j < h->nblocks; j++) {
            CBlock *tb = h->blocks[j];
            if (tb->tag_level < level)
                break;
            if (tb->tag_level == level && tb->num_words >= 150)
                tb->is_content = 1;
        }
    }
}

/* filters.py:408-426 F10 expand_title_to_content */
static void f_expand_title(Handler *h)
{
    Py_ssize_t title = -1, content_start = -1;
    for (Py_ssize_t j = 0; j < h->nblocks; j++) {
        CBlock *tb = h->blocks[j];
        if (content_start == -1 && tb->labels[LBL_TITLE] > 0)
            title = j;
        if (content_start == -1 && tb->is_content)
            content_start = j;
    }
    if (content_start <= title || title == -1)
        return;
    /* Go-port quirk (filter.go:598-599): a prefix of the doc */
    for (Py_ssize_t i = 0; i < content_start - title; i++) {
        CBlock *tb = h->blocks[i];
        if (tb->labels[LBL_MIGHT_BE_CONTENT] > 0)
            tb->is_content = 1;
    }
}

/* filters.py:431-445 F11 large_block_same_tag_level_to_content */
static void f_large_block_same_level(Handler *h)
{
    int tag_level = -1;
    for (Py_ssize_t j = 0; j < h->nblocks; j++) {
        CBlock *tb = h->blocks[j];
        if (tb->is_content && tb->labels[LBL_VERY_LIKELY_CONTENT] > 0) {
            tag_level = tb->tag_level;
            break;
        }
    }
    if (tag_level == -1)
        return;
    for (Py_ssize_t j = 0; j < h->nblocks; j++) {
        CBlock *tb = h->blocks[j];
        if (!tb->is_content && tb->num_words >= 100 &&
            tb->tag_level == tag_level)
            tb->is_content = 1;
    }
}

/* filters.py:450-467 F12 list_at_end */
static void f_list_at_end(Handler *h)
{
    long tag_level = 2147483647L; /* MAX_INT32 */
    for (Py_ssize_t j = 0; j < h->nblocks; j++) {
        CBlock *tb = h->blocks[j];
        if (tb->is_content && tb->labels[LBL_VERY_LIKELY_CONTENT] > 0) {
            tag_level = tb->tag_level;
        } else {
            if (tb->tag_level > tag_level &&
                tb->labels[LBL_MIGHT_BE_CONTENT] > 0 &&
                tb->labels[LBL_LIST] > 0 && cb_link_density(tb) == 0.0) {
                tb->is_content = 1;
            } else {
                tag_level = 2147483647L;
            }
        }
    }
}

/* filters.py:498-514 article_pipeline (filter.go:30-46 order) */
static int run_article_pipeline(Handler *h, const u32 *title,
                                Py_ssize_t title_len)
{
    if (f_terminating_blocks(h) < 0)
        return -1;
    if (f_title_match(h, title, title_len) < 0)
        return -1;
    f_num_words_rules(h);
    f_ignore_after_content(h);
    f_trailing_headline(h);
    if (f_block_proximity_fusion(h, 1, 0, 0) < 0)
        return -1;
    f_boilerplate_block(h);
    if (f_block_proximity_fusion(h, 1, 1, 1) < 0)
        return -1;
    f_keep_largest_blocks(h);
    f_expand_title(h);
    f_large_block_same_level(h);
    f_list_at_end(h);
    return 0;
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

/* convert the C block array to a Python list of
 * (text, nw, nlw, nwiwl, nwl, off_s, off_e, tag_level, is_content,
 *  ((label, count), ...)) tuples */
static PyObject *blocks_to_py(Handler *h)
{
    PyObject *lst = PyList_New(h->nblocks);
    if (!lst)
        return NULL;
    for (Py_ssize_t i = 0; i < h->nblocks; i++) {
        CBlock *cb = h->blocks[i];
        PyObject *text = str_from_u32(cb->text, cb->text_len);
        if (!text) {
            Py_DECREF(lst);
            return NULL;
        }
        int npairs = 0;
        for (int t = 0; t < N_LABELS; t++)
            if (cb->labels[t])
                npairs++;
        PyObject *labels = PyTuple_New(npairs);
        if (!labels) {
            Py_DECREF(text);
            Py_DECREF(lst);
            return NULL;
        }
        int w = 0;
        for (int t = 0; t < N_LABELS; t++)
            if (cb->labels[t]) {
                PyObject *pair = Py_BuildValue("(il)", t, cb->labels[t]);
                if (!pair) {
                    Py_DECREF(text);
                    Py_DECREF(labels);
                    Py_DECREF(lst);
                    return NULL;
                }
                PyTuple_SET_ITEM(labels, w++, pair);
            }
        PyObject *blk = Py_BuildValue(
            "(NlllllllNN)", text, cb->num_words, cb->num_linked_words,
            cb->nwiwl, cb->nwl, cb->off_start, cb->off_end,
            (long)cb->tag_level,
            PyBool_FromLong(cb->is_content), labels);
        if (!blk) {
            Py_DECREF(lst);
            return NULL;
        }
        PyList_SET_ITEM(lst, i, blk);
    }
    return lst;
}

/* Content() rendered straight from the filtered block array
 * (boilerpipe.go:76-106 Text(true,false) + Go html.EscapeString):
 * '\n'-join of is_content texts, strip ' '/'\n' at both ends, escape
 * & ' < > " exactly like document.py go_escape_string. Skips the
 * per-block Python tuples and TextBlock objects entirely — the Spark
 * hot path only needs (content, n_blocks, n_content). */
static PyObject *render_content(Handler *h, long *n_blocks, long *n_content)
{
    Py_ssize_t total = 0;
    long nb = 0, nc = 0;
    for (Py_ssize_t i = 0; i < h->nblocks; i++) {
        nb++;
        if (h->blocks[i]->is_content) {
            if (nc)
                total += 1; /* '\n' separator */
            total += h->blocks[i]->text_len;
            nc++;
        }
    }
    *n_blocks = nb;
    *n_content = nc;
    u32 *buf = (u32 *)PyMem_Malloc((size_t)(total ? total : 1) * sizeof(u32));
    if (!buf) {
        PyErr_NoMemory();
        return NULL;
    }
    Py_ssize_t w = 0;
    for (Py_ssize_t i = 0; i < h->nblocks; i++) {
        CBlock *cb = h->blocks[i];
        if (!cb->is_content)
            continue;
        if (w)
            buf[w++] = '\n';
        memcpy(buf + w, cb->text, (size_t)cb->text_len * sizeof(u32));
        w += cb->text_len;
    }
    /* Python str.strip(" \n") */
    Py_ssize_t a = 0, b = w;
    while (a < b && (buf[a] == ' ' || buf[a] == '\n'))
        a++;
    while (b > a && (buf[b - 1] == ' ' || buf[b - 1] == '\n'))
        b--;
    /* escape: & -> &amp; (5)  ' -> &#39; (5)  " -> &#34; (5)
     *         < -> &lt; (4)   > -> &gt; (4) */
    Py_ssize_t out_n = 0;
    for (Py_ssize_t i = a; i < b; i++) {
        switch (buf[i]) {
        case '&': case '\'': case '"': out_n += 5; break;
        case '<': case '>': out_n += 4; break;
        default: out_n += 1;
        }
    }
    u32 *out = (u32 *)PyMem_Malloc(
        (size_t)(out_n ? out_n : 1) * sizeof(u32));
    if (!out) {
        PyMem_Free(buf);
        PyErr_NoMemory();
        return NULL;
    }
    Py_ssize_t k = 0;
    for (Py_ssize_t i = a; i < b; i++) {
        u32 c = buf[i];
        const char *rep = NULL;
        switch (c) {
        case '&': rep = "&amp;"; break;
        case '\'': rep = "&#39;"; break;
        case '"': rep = "&#34;"; break;
        case '<': rep = "&lt;"; break;
        case '>': rep = "&gt;"; break;
        }
        if (rep) {
            for (const char *q = rep; *q; q++)
                out[k++] = (u32)*q;
        } else {
            out[k++] = c;
        }
    }
    PyObject *res = str_from_u32(out, k);
    PyMem_Free(buf);
    PyMem_Free(out);
    return res;
}

/* shared parse driver; run_filters: 0 = raw blocks, 1 = run the Article
 * pipeline in C when there is no ld+json (the ld+json headline can
 * override the title F2 uses, so those documents return raw blocks and
 * the caller runs the Python pipeline after the merge).
 * Returns (title, blocks, ld_json, datetimes, filtered: bool); with
 * render=1 returns the extract_content shape
 * (title, blocks|None, content|None, n_blocks, n_content, ld_json,
 *  datetimes, filtered) — content rendered in C when filtered, raw
 * blocks returned for the Python ld+json merge otherwise. */
static PyObject *parse_impl_ex(PyObject *html, int run_filters,
                               PyObject *title_override, int render)
{
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

    int filtered = 0;
    if (rc == 0 && run_filters &&
        (title_override != NULL || PyList_GET_SIZE(h.ld_json) == 0)) {
        /* title_override: the ld+json-merged title from the second call
         * on documents whose first extract() returned filtered=False */
        PyObject *tsrc = title_override ? title_override : h.title;
        Py_UCS4 *tb = NULL;
        Py_ssize_t tn = 0;
        if (tsrc) {
            tn = PyUnicode_GET_LENGTH(tsrc);
            tb = PyUnicode_AsUCS4Copy(tsrc);
            if (!tb)
                rc = -1;
        }
        if (rc == 0) {
            rc = run_article_pipeline(&h, (const u32 *)tb, tn);
            filtered = (rc == 0);
        }
        PyMem_Free(tb);
    }

    PyObject *result = NULL;
    if (rc == 0 && !render) {
        PyObject *blocks = blocks_to_py(&h);
        if (blocks) {
            PyObject *title = h.title ? h.title : PyUnicode_New(0, 0);
            if (h.title)
                Py_INCREF(h.title);
            result = Py_BuildValue("(NNOON)", title, blocks, h.ld_json,
                                   h.datetimes, PyBool_FromLong(filtered));
        }
    } else if (rc == 0) {
        PyObject *blocks = NULL, *content = NULL;
        long nb = 0, nc = 0;
        if (filtered) {
            content = render_content(&h, &nb, &nc);
            if (content) {
                blocks = Py_None;
                Py_INCREF(Py_None);
            }
        } else {
            /* ld+json doc: raw blocks for the Python merge +
             * filter_blocks_content second pass */
            blocks = blocks_to_py(&h);
            if (blocks) {
                content = Py_None;
                Py_INCREF(Py_None);
            }
        }
        if (blocks && content) {
            PyObject *title = h.title ? h.title : PyUnicode_New(0, 0);
            if (h.title)
                Py_INCREF(h.title);
            result = Py_BuildValue("(NNNllOON)", title, blocks, content,
                                   nb, nc, h.ld_json, h.datetimes,
                                   PyBool_FromLong(filtered));
        } else {
            Py_XDECREF(blocks);
            Py_XDECREF(content);
        }
    }
    h_free(&h);
    parser_free(&p);
    PyMem_Free(buf);
    return result;
}

static PyObject *parse_impl(PyObject *html, int run_filters,
                            PyObject *title_override)
{
    return parse_impl_ex(html, run_filters, title_override, 0);
}

/* inverse of blocks_to_py: rebuild the CBlock array from the tuples a
 * previous extract()/parse() call returned, so the Article pipeline can
 * re-run WITHOUT re-parsing the document (the ld+json title-override
 * path: ~6% of real crawls carry ld+json whose merged headline must be
 * known before f_title_match; boilerpipe.go:124-148). */
static int blocks_from_py(Handler *h, PyObject *blocks)
{
    PyObject *seq = PySequence_Fast(blocks, "blocks must be a sequence");
    if (!seq)
        return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *blk = PySequence_Fast_GET_ITEM(seq, i);
        PyObject *text, *labels, *is_content;
        long nw, nlw, nwiwl, nwl, o1, o2, tag_level;
        if (!PyArg_ParseTuple(blk, "UlllllllOO!", &text, &nw, &nlw,
                              &nwiwl, &nwl, &o1, &o2, &tag_level,
                              &is_content, &PyTuple_Type, &labels)) {
            Py_DECREF(seq);
            return -1;
        }
        CBlock *cb = (CBlock *)PyMem_Malloc(sizeof(CBlock));
        if (!cb) {
            Py_DECREF(seq);
            PyErr_NoMemory();
            return -1;
        }
        memset(cb, 0, sizeof(CBlock));
        cb->text_len = PyUnicode_GET_LENGTH(text);
        cb->text = (u32 *)PyUnicode_AsUCS4Copy(text);
        if (!cb->text) {
            PyMem_Free(cb);
            Py_DECREF(seq);
            return -1;
        }
        cb->num_words = nw;
        cb->num_linked_words = nlw;
        cb->nwiwl = nwiwl;
        cb->nwl = nwl;
        cb->off_start = o1;
        cb->off_end = o2;
        cb->tag_level = (int)tag_level;
        cb->is_content = PyObject_IsTrue(is_content);
        Py_ssize_t np = PyTuple_GET_SIZE(labels);
        for (Py_ssize_t j = 0; j < np; j++) {
            PyObject *pair = PyTuple_GET_ITEM(labels, j);
            long t, cnt;
            if (!PyArg_ParseTuple(pair, "ll", &t, &cnt)) {
                cblock_free(cb);
                Py_DECREF(seq);
                return -1;
            }
            if (t >= 0 && t < N_LABELS)
                cb->labels[t] = cnt;
        }
        if (h->nblocks >= h->cap_blocks) {
            Py_ssize_t nc = h->cap_blocks ? h->cap_blocks * 2 : 64;
            CBlock **npb = (CBlock **)PyMem_Realloc(
                h->blocks, (size_t)nc * sizeof(CBlock *));
            if (!npb) {
                cblock_free(cb);
                Py_DECREF(seq);
                PyErr_NoMemory();
                return -1;
            }
            h->blocks = npb;
            h->cap_blocks = nc;
        }
        h->blocks[h->nblocks++] = cb;
    }
    Py_DECREF(seq);
    return 0;
}

/* filter_blocks(blocks, title) -> blocks: Article pipeline over
 * pre-parsed raw blocks — no tokenizer re-entry. With render=1 returns
 * (content, n_blocks, n_content) instead of the block tuples. */
static PyObject *filter_blocks_impl(PyObject *args, int render)
{
    PyObject *blocks, *title = NULL;
    if (!PyArg_ParseTuple(args, "O|O", &blocks, &title))
        return NULL;
    if (title == Py_None)
        title = NULL;
    if (title && !PyUnicode_Check(title)) {
        PyErr_SetString(PyExc_TypeError, "title override must be str");
        return NULL;
    }
    if (!g_ready) {
        PyErr_SetString(PyExc_RuntimeError, "init_tables() not called");
        return NULL;
    }
    Handler h;
    if (h_init(&h) < 0) {
        h_free(&h);
        return NULL;
    }
    int rc = blocks_from_py(&h, blocks);
    Py_UCS4 *tb = NULL;
    Py_ssize_t tn = 0;
    if (rc == 0 && title) {
        tn = PyUnicode_GET_LENGTH(title);
        tb = PyUnicode_AsUCS4Copy(title);
        if (!tb)
            rc = -1;
    }
    if (rc == 0)
        rc = run_article_pipeline(&h, (const u32 *)tb, tn);
    PyMem_Free(tb);
    PyObject *result = NULL;
    if (rc == 0 && !render) {
        result = blocks_to_py(&h);
    } else if (rc == 0) {
        long nb = 0, nc = 0;
        PyObject *content = render_content(&h, &nb, &nc);
        if (content)
            result = Py_BuildValue("(Nll)", content, nb, nc);
    }
    h_free(&h);
    return result;
}

static PyObject *py_filter_blocks(PyObject *self, PyObject *args)
{
    return filter_blocks_impl(args, 0);
}

static PyObject *py_filter_blocks_content(PyObject *self, PyObject *args)
{
    return filter_blocks_impl(args, 1);
}

static PyObject *py_extract_content(PyObject *self, PyObject *args)
{
    PyObject *html;
    if (!PyArg_ParseTuple(args, "U", &html))
        return NULL;
    return parse_impl_ex(html, 1, NULL, 1);
}

static PyObject *py_parse(PyObject *self, PyObject *args)
{
    PyObject *html;
    if (!PyArg_ParseTuple(args, "U", &html))
        return NULL;
    return parse_impl(html, 0, NULL);
}

static PyObject *py_extract(PyObject *self, PyObject *args)
{
    PyObject *html, *override = NULL;
    if (!PyArg_ParseTuple(args, "U|O", &html, &override))
        return NULL;
    if (override == Py_None)
        override = NULL;
    if (override && !PyUnicode_Check(override)) {
        PyErr_SetString(PyExc_TypeError, "title override must be str");
        return NULL;
    }
    return parse_impl(html, 1, override);
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
     "parse(html) -> (title, raw_blocks, ld_json, datetimes, False)"},
    {"filter_blocks", py_filter_blocks, METH_VARARGS,
     "filter_blocks(blocks, title) -> blocks — run the Article pipeline "
     "on pre-parsed raw blocks (ld+json title-override path; no re-parse)"},
    {"filter_blocks_content", py_filter_blocks_content, METH_VARARGS,
     "filter_blocks_content(blocks, title) -> (content, n_blocks, "
     "n_content) — filter_blocks + C-side Content() rendering"},
    {"extract_content", py_extract_content, METH_VARARGS,
     "extract_content(html) -> (title, blocks|None, content|None, "
     "n_blocks, n_content, ld_json, datetimes, filtered) — Spark hot "
     "path: full pipeline + C-side Content() rendering, no block tuples"},
    {"extract", py_extract, METH_VARARGS,
     "extract(html) -> (title, blocks, ld_json, datetimes, filtered) — "
     "runs the Article pipeline in C when no ld+json is present"},
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
