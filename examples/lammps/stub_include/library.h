// stub: the C library interface header is included but no symbol from
// it is referenced by the client
#ifndef LMP_LIBRARY_H
#define LMP_LIBRARY_H
#endif
