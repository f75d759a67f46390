// Transport bootstrap for native Pipes tasks — mirrors the reference's
// C++ runtime behavior: if the engine exported hadoop.pipes.command.port
// (Application.java:120-125), connect to that loopback port and splice
// the connection onto stdin/stdout via dup2, so ALL protocol code in the
// task stays plain getchar/putchar regardless of transport. Without the
// env var the task speaks its inherited stdio (the engine's stdio mode).
#ifndef PIPES_TRANSPORT_H
#define PIPES_TRANSPORT_H

#include <arpa/inet.h>
#include <cstdlib>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

// Returns 0 on success (or when no port env var is set), nonzero on a
// connection failure — callers should exit with that status.
static int pipes_connect_transport() {
  const char *port_s = getenv("hadoop.pipes.command.port");
  if (port_s == nullptr) return 0;  // stdio mode
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return 3;
  sockaddr_in addr;
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)atoi(port_s));
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  if (connect(fd, (sockaddr *)&addr, sizeof(addr)) != 0) return 3;
  if (dup2(fd, 0) < 0 || dup2(fd, 1) < 0) return 3;
  close(fd);
  return 0;
}

#endif  // PIPES_TRANSPORT_H
