/* Minimal opaque stub so the reference headers parse without libsqlite3-dev.
 * Only type names are needed: the oracle build compiles spectra.c/voigt.c,
 * which never call sqlite functions. */
#ifndef SQLITE3_STUB_H_
#define SQLITE3_STUB_H_
typedef struct sqlite3 sqlite3;
typedef struct sqlite3_stmt sqlite3_stmt;
#endif
