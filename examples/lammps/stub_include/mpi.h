// stub: the MPI surface the client touches (LAMMPS ships similar
// STUBS/mpi.h for serial builds)
#ifndef LMP_STUB_MPI_H
#define LMP_STUB_MPI_H
typedef int MPI_Comm;
#define MPI_COMM_WORLD 0
#endif
